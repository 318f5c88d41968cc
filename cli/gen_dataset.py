#!/usr/bin/env python3
"""Dataset generator CLI — mirrors the reference's gen_dataset.py surface:
pre-generates input_*/target_* wav pairs with knob values burned into target
filenames (4 significant figures, double-underscore convention), an 80/20
Train/Val split, grid-spaced Train knobs when --sp is given (int2knobs), and
an effect_info.ini.

TPU-first: input synthesis and the effect run as one jitted, batched device
program — whole BATCHES of files per device call instead of the reference's
one-file-per-process mp.Pool fan-out (gen_dataset.py:233-241).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from signaltrain_tpu.data import audio_io


def main():
    parser = argparse.ArgumentParser(
        description="Generate synthetic data. Train will have knob-values "
        "equally spaced, Val will be random",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("name", help="Name of the dataset (creates new subdirectory)")
    parser.add_argument(
        "-d", "--dur", type=float,
        help="Duration of generated input (& ouput) files, in seconds (approximate)",
        default=5,
    )
    parser.add_argument(
        "--sp", type=int, help="Settings per knob (in Train set)", default=None
    )
    parser.add_argument(
        "-n", "--num", type=int,
        help="Number of audio files to generate (turned off if --sp option enabled)",
        default=20000,
    )
    parser.add_argument("-e", "--effect", help="Name of effect to use", default="comp_4c")
    parser.add_argument("--inpath", help="Can read audio input files from here", default=None)
    parser.add_argument("--sr", type=int, help="Sampling rate", default=44100)
    parser.add_argument(
        "--device-batch", type=int, default=64,
        help="files synthesized per device call",
    )
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument(
        "--pcm16", action="store_true",
        help="write 16-bit PCM wavs (half the bytes; default float32 matches "
        "the reference's output format)",
    )
    parser.add_argument(
        "--backend", choices=("auto", "device", "host"), default="auto",
        help="where to synthesize+apply: 'device' batches whole files "
        "through one jitted TPU program; 'host' runs jax-on-CPU synthesis "
        "and the native C++ compressor kernels with a process pool (the "
        "reference's mp.Pool architecture, gen_dataset.py:233-241) — wins "
        "whenever the device->host link, not compute, bounds throughput; "
        "'auto' probes the link and picks",
    )
    parser.add_argument(
        "--workers", type=int, default=0,
        help="host-backend worker processes (0 = cpu count)",
    )
    args = parser.parse_args()

    if args.sp is None:
        print(
            "Warning: Defaults will generate approximately",
            33.7 * args.num / 20000 * args.dur / 5,
            "GB of audio in Train/ and Val/ directories",
        )
    if args.backend == "host":
        # keep this process off the accelerator entirely: synthesis runs
        # jax-on-CPU, the effect runs in the native C++ kernel. Hard-set
        # (not setdefault): harness environments pin JAX_PLATFORMS to the
        # TPU platform, and a host run must override that.
        os.environ["JAX_PLATFORMS"] = "cpu"
    gen_synth_data(args)


# float [-1,1] -> int16 by ROUNDING (ADVICE r2 #2): the single shared
# definition lives in the library so every producer/consumer quantizes
# identically (gen_dataset backends, predict_long --pcm16, int16 data tier)
to_pcm16 = audio_io.to_pcm16


def gen_synth_data(args):
    if args.backend == "host":
        # must precede ANY jnp computation (knobs_wc below runs on device):
        # the first jax op initializes the default backend, and after that
        # the platform can no longer be switched to cpu
        _force_cpu_platform()
    import jax
    import jax.numpy as jnp

    from signaltrain_tpu.data import audio_io
    from signaltrain_tpu.dsp import effects as fx, knobs as knobs_mod, synths
    from signaltrain_tpu.utils.cache import enable_compilation_cache

    np.random.seed(args.seed)
    enable_compilation_cache()

    name, sr, settings_per, inpath = args.name, args.sr, args.sp, args.inpath
    num_outfiles = args.num

    gen_effects = ("comp_4c", "comp", "comp_t", "comp_4c_large", "comp_one")
    if args.effect not in gen_effects:
        print("Sorry, not set up to work for other effects")
        sys.exit(1)
    effect = fx.make_effect(args.effect, sr=sr)
    effect.info()
    nk = len(effect.knob_ranges)

    train_val_split = 0.8
    if settings_per is not None:
        num_train_files = int(settings_per**nk)
        if (inpath is None) or (("Train" not in inpath) and ("Val" not in inpath)):
            num_outfiles = int(num_train_files / train_val_split)
        else:
            num_outfiles = num_train_files
        print(
            f"Evenly spacing {settings_per} settings across {nk} knob(s), for "
            f"{num_train_files} files in Train and {num_outfiles} total files"
        )

    for d in [name, name + "/Train", name + "/Val"]:
        os.makedirs(d, exist_ok=True)

    with open(name + "/effect_info.ini", "w") as f:
        print("[effect]", file=f)
        print(f"name = {effect.name}", file=f)
        print(f"knob_names = {effect.knob_names}", file=f)
        print(f"knob_ranges = {np.asarray(effect.knob_ranges).tolist()}", file=f)

    clip_length = 4096
    num_clips = int(np.ceil(args.dur * sr / clip_length))
    signal_length = clip_length * num_clips

    infile_list = None
    if inpath is not None:
        infile_list = glob.glob(inpath + "/*.wav") + glob.glob(inpath + "/*/*.wav")
        infile_list = [x for x in infile_list if "target" not in x]
        print("\ninfile_list =", infile_list)
    else:
        print(f"Number of {clip_length}-length clips per synthesized input file: {num_clips}")

    start_output_i = len(glob.glob(name + "/*/input*"))  # append-safe indexing

    # ---- knob settings per file (host): grid for Train via int2knobs,
    # random for Val / beyond the grid (gen_dataset.py:116-133)
    all_knobs_wc, all_outpaths, all_inputs_from_file = [], [], []
    for i in range(num_outfiles):
        if infile_list is not None:
            infilename = infile_list[i % len(infile_list)]
            sub = "Train/" if "Train" in infilename else (
                "Val/" if "Val" in infilename else "Test/"
            )
            os.makedirs(os.path.join(name, sub), exist_ok=True)
            all_outpaths.append(sub)
            all_inputs_from_file.append(infilename)
        else:
            all_outpaths.append("Val/" if i / num_outfiles > 0.8 else "Train/")
            all_inputs_from_file.append(None)
        in_train = all_outpaths[-1] in ("Train/", "Val/")
        if (not in_train) or settings_per is None or i >= settings_per**nk:
            knobs_nn = np.random.rand(nk) - 0.5
            kw = np.asarray(effect.knobs_wc(knobs_nn))
        else:
            kw = np.asarray(
                knobs_mod.int2knobs(i, np.asarray(effect.knob_ranges), settings_per)
            )
        # 4 significant figures, round-trip through the string
        all_knobs_wc.append([float("%s" % float("%.4g" % v)) for v in kw])

    choosers = (0, 1, 2, 4, 6, 7, 8, 9)  # gen_dataset.py:101 (skips spikes)
    db = args.device_batch

    backend = _resolve_backend(args, jax)
    if backend == "host":
        _force_cpu_platform()
        _gen_host_data(
            args, name, all_outpaths, all_knobs_wc, all_inputs_from_file,
            start_output_i, sr, clip_length, num_clips, signal_length,
            num_outfiles, choosers,
        )
        return

    # ---- batched synthesis + effect on device
    t = jnp.arange(clip_length, dtype=jnp.float32) / sr

    def synth_file(key):
        keys = jax.random.split(key, num_clips)

        def one_clip(k):
            kc, ks = jax.random.split(k)
            ch = synths.choose_from(kc, choosers)
            y = synths.synth_input_sample(ks, t, ch, branch_set=choosers)
            # conditional normalization (gen_dataset.py:106-108)
            m = jnp.max(jnp.abs(y))
            return jnp.where(m > 1.0, y / m, y)

        return jax.vmap(one_clip)(keys).reshape(-1)

    @jax.jit
    def gen_device_batch(key, knobs_wc_batch):
        keys = jax.random.split(key, db)
        x = jax.vmap(synth_file)(keys)  # (db, signal_length)
        kr = jnp.asarray(effect.knob_ranges)
        knobs_nn = (knobs_wc_batch - kr[None, :, 0]) / (
            kr[None, :, 1] - kr[None, :, 0]
        ) - 0.5
        y, x = effect.go_batch(x, knobs_nn, keys=keys)
        if args.pcm16:  # device-side PCM conversion: half the bytes pulled
            return to_pcm16(x, jnp), to_pcm16(y, jnp)
        return x, y

    log_every = 100
    base_key = jax.random.PRNGKey(args.seed)
    pending = None  # (device_x, device_y, b0, bend): one batch in flight
    batch_starts = list(range(0, num_outfiles, db))
    for bi in range(len(batch_starts) + 1):
        # dispatch batch bi (async) BEFORE pulling batch bi-1: device compute
        # and the device->host transfer overlap the wav writing of the
        # previous batch, which is what bounds throughput when the host link
        # is slow (synthesis itself is ~ms per batch).
        if bi < len(batch_starts) and infile_list is None:
            b0 = batch_starts[bi]
            bend = min(b0 + db, num_outfiles)
            kw_batch = np.zeros((db, nk), np.float32)
            kw_batch[: bend - b0] = np.asarray(all_knobs_wc[b0:bend], np.float32)
            xd, yd = gen_device_batch(
                jax.random.fold_in(base_key, b0), jnp.asarray(kw_batch)
            )
            new_pending = (xd, yd, b0, bend)
        else:
            new_pending = None

        if pending is not None:
            xd, yd, b0, bend = pending
            x, y = np.asarray(xd), np.asarray(yd)
            _write_pairs(effect, name, all_outpaths, all_knobs_wc,
                         start_output_i, x, y, b0, bend, num_outfiles,
                         log_every, sr)
        pending = new_pending

    for b0 in (batch_starts if infile_list is not None else []):
        bend = min(b0 + db, num_outfiles)
        kw_batch = np.zeros((db, nk), np.float32)
        kw_batch[: bend - b0] = np.asarray(all_knobs_wc[b0:bend], np.float32)

        # crop real audio on host, run the effect batched on device
        xs = np.zeros((db, signal_length), np.float32)
        for j, i in enumerate(range(b0, bend)):
            sig, _ = audio_io.read_audio_file(
                all_inputs_from_file[i], sr=sr, warn=False
            )
            if signal_length >= len(sig):
                xs[j, : len(sig)] = sig
            else:
                ri = np.random.randint(0, len(sig) - signal_length - 1 + 1)
                xs[j] = sig[ri : ri + signal_length]
        kr = np.asarray(effect.knob_ranges)
        knobs_nn = (kw_batch - kr[None, :, 0]) / (kr[None, :, 1] - kr[None, :, 0]) - 0.5
        keys = jax.random.split(jax.random.fold_in(base_key, b0), db)
        y, x = effect.go_batch(jnp.asarray(xs), jnp.asarray(knobs_nn), keys=keys)
        if args.pcm16:  # same conversion as the synth path (ADVICE r2 #2)
            x, y = to_pcm16(x, jnp), to_pcm16(y, jnp)
        x, y = np.asarray(x), np.asarray(y)
        _write_pairs(effect, name, all_outpaths, all_knobs_wc,
                     start_output_i, x, y, b0, bend, num_outfiles,
                     log_every, sr)


def _write_pairs(effect, name, all_outpaths, all_knobs_wc, start_output_i,
                 x, y, b0, bend, num_outfiles, log_every, sr):
    from signaltrain_tpu.data import audio_io

    for j, i in enumerate(range(b0, bend)):
        out_idx = start_output_i + i
        outpath = os.path.join(name, all_outpaths[i])
        knobs_str = "".join("__%s" % v for v in all_knobs_wc[i])
        fin = os.path.join(outpath, f"input_{out_idx}_.wav")
        ftg = os.path.join(outpath, f"target_{out_idx}_{effect.name}{knobs_str}.wav")
        if i % log_every == 0:
            print(
                f"outfile_i = {i}/{num_outfiles}, outpath = {outpath}, "
                f"outfilename_input = {fin}, target = {ftg}"
            )
        if x.dtype == np.int16:
            audio_io.write_audio_file(fin, x[j], sr)
            audio_io.write_audio_file(ftg, y[j], sr)
        else:
            audio_io.write_audio_file(fin, x[j].astype(np.float32), sr)
            audio_io.write_audio_file(ftg, y[j].astype(np.float32), sr)


# ---------------------------------------------------------------------------
# Host backend: jax-on-CPU synthesis + native C++ compressor kernels, fanned
# out over an mp.Pool — the reference's own architecture (gen_dataset.py:
# 233-241). The device path must pull every synthesized sample back over the
# host link to write wavs; when that link is slow (this harness: ~2-4 MB/s
# relay -> 2.4 files/s) the all-host path wins outright (VERDICT r2 item 3).
# ---------------------------------------------------------------------------

def _force_cpu_platform():
    """Pin this process's jax to the CPU backend. The env var alone is not
    enough: TPU plugins can force-register regardless of JAX_PLATFORMS, so
    the platform is also overridden through jax.config before any backend
    initializes (same trick as __graft_entry__.dryrun_multichip and
    tests/conftest.py)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return jax


def _resolve_backend(args, jax):
    """auto: 'device' on CPU-only installs (tests) and fast links; 'host'
    when pulling audio from the device is slower than ~100 MB/s."""
    if args.backend != "auto":
        return args.backend
    if jax.default_backend() == "cpu":
        return "device"
    import time

    import jax.numpy as jnp

    a = jnp.zeros((1 << 20,), jnp.float32)  # 4 MB
    np.asarray(a + 0.0)  # warm/compile
    t0 = time.perf_counter()
    np.asarray(a + 1.0)  # fresh buffer: forces a real device->host pull
    rate = a.nbytes / max(1e-9, time.perf_counter() - t0)
    picked = "host" if rate < 100e6 else "device"
    print(f"gen_dataset auto backend: device->host pull {rate / 1e6:.0f} MB/s "
          f"-> {picked}")
    return picked


def _host_effect_fn(effect, sr):
    """The native C++ kernel matching this effect (None if unsupported).
    All gen_dataset effects are the compressor family, whose reference
    kernels (audio.py:348-426) the C++ oracle reimplements bit-trustworthily
    (native/compressor_oracle.cpp)."""
    from signaltrain_tpu.utils import native

    name = effect.name
    if name == "Compressor":
        return lambda x, kw: native.compressor_3knob(
            x, float(kw[0]), float(kw[1]), float(kw[2]), sr=sr)
    if name in ("Compressor_4c", "Compressor_4c_Large", "Compressor_4c_OneSetting"):
        return lambda x, kw: native.compressor_4controls(
            x, float(kw[0]), float(kw[1]), float(kw[2]), float(kw[3]), sr=sr)
    if name == "Comp_Just_Thresh":
        return lambda x, kw: native.compressor_4controls(
            x, float(kw[0]), effect.ratio, effect.attack, effect.release, sr=sr)
    return None


class _HostGen:
    """Per-process generator state: jitted CPU synthesis + C++ effect.

    Synthesis reuses the SAME jax synth branches as the device path via
    stratified_synth_batch (each branch vectorized over its share of the
    clips — a vmapped switch would compute all 8 branches for every clip),
    with the pinknoise cosine table built once on host
    (synths.irfft_cos_matrix_host). Chooser coverage is exactly-even over
    each task's clips + a random permutation, vs. iid-uniform per clip on
    the device path — same marginal distribution."""

    def __init__(self, payload):
        self.p = payload
        jax = _force_cpu_platform()
        import jax.numpy as jnp
        from signaltrain_tpu.dsp import effects as fx, synths

        self.jax = jax
        sr = payload["sr"]
        self.effect = fx.make_effect(payload["effect_cli"], sr=sr)
        self.effect_fn = _host_effect_fn(self.effect, sr)
        assert self.effect_fn is not None, self.effect.name
        self.cpu = jax.devices("cpu")[0]
        clip, nclips, db = (
            payload["clip_length"], payload["num_clips"], payload["db"])
        if payload["synth"]:
            cm = jax.device_put(synths.irfft_cos_matrix_host(clip), self.cpu)
            t = jax.device_put(
                np.arange(clip, dtype=np.float32) / sr, self.cpu)
            total = db * nclips

            def synth(key):
                x = synths.stratified_synth_batch(
                    key, t, choosers=payload["choosers"], batch=total,
                    cos_mat=cm)
                m = jnp.max(jnp.abs(x), axis=1, keepdims=True)
                x = jnp.where(m > 1.0, x / m, x)
                return x.reshape(db, nclips * clip)

            self._synth = jax.jit(synth)

    def run_range(self, task):
        b0, bend = task
        p = self.p
        if p["synth"]:
            key = self.jax.random.fold_in(
                self.jax.random.PRNGKey(p["seed"]), b0)
            with self.jax.default_device(self.cpu):
                x = np.asarray(self._synth(key))[: bend - b0]
        else:
            from signaltrain_tpu.data import audio_io

            rng = np.random.default_rng(p["seed"] + b0)
            x = np.zeros((bend - b0, p["signal_length"]), np.float32)
            for j, i in enumerate(range(b0, bend)):
                sig, _ = audio_io.read_audio_file(
                    p["infiles"][i], sr=p["sr"], warn=False)
                if p["signal_length"] >= len(sig):
                    x[j, : len(sig)] = sig
                else:
                    ri = int(rng.integers(0, len(sig) - p["signal_length"]))
                    x[j] = sig[ri : ri + p["signal_length"]]
        y = np.stack([
            self.effect_fn(x[j], p["knobs_wc"][b0 + j])
            for j in range(bend - b0)
        ])
        if p["pcm16"]:
            x, y = to_pcm16(x), to_pcm16(y)
        _write_pairs(
            self.effect, p["name"], p["outpaths"], p["knobs_wc"],
            p["start_output_i"], x, y, b0, bend, p["num_outfiles"],
            p["log_every"], p["sr"],
        )
        return bend - b0


_HG = None


def _host_worker_init(payload):
    # pins the pool worker to the CPU backend (env + jax.config) so N
    # workers never contend for the accelerator
    _force_cpu_platform()
    global _HG
    _HG = _HostGen(payload)


def _host_run_range(task):
    return _HG.run_range(task)


def _gen_host_data(args, name, all_outpaths, all_knobs_wc, all_inputs_from_file,
                   start_output_i, sr, clip_length, num_clips, signal_length,
                   num_outfiles, choosers):
    import multiprocessing as mp
    import time

    synth = all_inputs_from_file[0] is None if all_inputs_from_file else True
    payload = dict(
        effect_cli=args.effect, sr=sr, seed=args.seed, pcm16=args.pcm16,
        choosers=tuple(choosers), clip_length=clip_length,
        num_clips=num_clips, signal_length=signal_length,
        db=args.device_batch, synth=synth, name=name,
        outpaths=all_outpaths, knobs_wc=all_knobs_wc,
        infiles=all_inputs_from_file, start_output_i=start_output_i,
        num_outfiles=num_outfiles, log_every=100,
    )
    tasks = [
        (b0, min(b0 + args.device_batch, num_outfiles))
        for b0 in range(0, num_outfiles, args.device_batch)
    ]
    workers = args.workers or os.cpu_count() or 1
    t0 = time.perf_counter()
    if workers <= 1:
        gen = _HostGen(payload)
        done = 0
        for task in tasks:
            done += gen.run_range(task)
    else:
        ctx = mp.get_context("spawn")
        with ctx.Pool(workers, initializer=_host_worker_init,
                      initargs=(payload,)) as pool:
            done = sum(pool.imap_unordered(_host_run_range, tasks))
    dt = time.perf_counter() - t0
    print(f"host backend: {done} file pairs in {dt:.1f} s "
          f"({done / max(dt, 1e-9):.1f} files/s, {workers} worker(s))")


if __name__ == "__main__":
    main()
