"""Console banner (the reference greets with an ASCII train,
misc.py:9-18 print_choochoo; ours rides rails of a different gauge)."""


def print_choochoo(version: str):
    print(r"""
   _____________            ~ ~ ~
  | [] [] [] [] |___________/ ~ ~
  |_____________|_| TPU |_|_|
    (o)     (o)   (o) (o)
 ================================
 signaltrain-tpu """ + version + "\n")
