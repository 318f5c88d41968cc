#!/bin/bash
# Batch re-write wavs via sox (reference: utils/procfiles.sh) — normalizes
# encoding/precision of every *.wav in the current directory in place.
for f in *.wav; do
    echo "$f"
    sox "$f" -b 16 "tmp_$f" && mv "tmp_$f" "$f"
done
