"""Feature/label generation: the TRAINING=1 `percepNet` binary equivalent.

Usage (reference CLI shape, denoise.cpp:603-650):
  python -m percepnet_tpu featgen clean.pcm noisy.pcm count out.f32
  python -m percepnet_tpu featgen --pairs-file pairs.txt --out-dir feats/

Writes <count> frames of 138 float32 records per pair
(denoise.cpp:761-773): [Ey_look(34), Ephaty(34), T, pitch_corr, g(34),
r(34)].  Inputs are read at raw int16 amplitude (NORM_RATIO=1,
denoise.cpp:41).  --test additionally writes the oracle-enhanced
test_output.pcm / test_input.pcm pair (the reference's built-in
integration test, denoise.cpp:742-759).

A pairs file has lines `clean.pcm noisy.pcm [count] [out.f32]` and is the
TPU replacement for the 8-process shell fan-out (utils/run.sh:98-122):
pairs are batched onto the chip together, and --shard-id/--num-shards give
multi-host sharding.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def generate_pair(clean: np.ndarray, noisy: np.ndarray, count: int, *,
                  apply_postfilter: bool = True, oracle: bool = False):
    """(records [count, 138], oracle dict or None) for one clean/noisy pair."""
    import jax.numpy as jnp
    from percepnet_tpu import constants as C
    from percepnet_tpu.enhance import enhance_spectra
    from percepnet_tpu.features import analyze_utterance, make_labels, \
        make_records

    n = count * C.FRAME_SIZE
    clean = np.pad(clean[:n], (0, max(0, n - len(clean))))
    noisy = np.pad(noisy[:n], (0, max(0, n - len(noisy))))

    clean_out, _ = analyze_utterance(jnp.asarray(clean, jnp.float32))
    noisy_out, _ = analyze_utterance(jnp.asarray(noisy, jnp.float32))
    records = make_records(clean_out, noisy_out,
                           apply_postfilter=apply_postfilter)

    test = None
    if oracle:
        lab = make_labels(clean_out, noisy_out,
                          apply_postfilter=apply_postfilter)
        pcm, _ = enhance_spectra(noisy_out, lab["g"], lab["r"])
        test = {"output": np.asarray(pcm), "input": noisy}
    return np.asarray(records), test


def generate_batch(cleans, noisys, count: int, *,
                   apply_postfilter: bool = True) -> np.ndarray:
    """Batched records for equal-count pairs: [n_pairs, count, 138].

    The TPU replacement for the 8-process binary fan-out
    (utils/run.sh:98-122): both streams of up to dozens of pairs are
    analyzed in ONE jitted pass each, amortizing dispatch and keeping the
    chip full (vs ~3 s/pair sequentially through a remote tunnel).
    """
    import jax.numpy as jnp
    from percepnet_tpu import constants as C
    from percepnet_tpu.features import analyze_batch, make_records

    n = count * C.FRAME_SIZE

    def stack(sigs):
        out = np.zeros((len(sigs), n), np.float32)
        for i, s in enumerate(sigs):
            m = min(len(s), n)
            out[i, :m] = s[:m]
        return jnp.asarray(out)

    clean_out, _ = analyze_batch(stack(cleans))
    noisy_out, _ = analyze_batch(stack(noisys))
    return np.asarray(make_records(clean_out, noisy_out,
                                   apply_postfilter=apply_postfilter))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="percepnet-tpu featgen",
                                 description=__doc__.splitlines()[0])
    ap.add_argument("args", nargs="*",
                    help="clean.pcm noisy.pcm count out.f32")
    ap.add_argument("--pairs-file", help="file of: clean noisy [count] [out]")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--count", type=int, default=2000,
                    help="frames per pair (run.sh uses 2000)")
    ap.add_argument("--no-postfilter", action="store_true",
                    help="dump un-postfiltered gains (see features.labels)")
    ap.add_argument("--test", action="store_true",
                    help="also write oracle test_output.pcm/test_input.pcm")
    ap.add_argument("--shard-id", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--batch", type=int, default=16,
                    help="pairs analyzed per jitted pass (no --test only)")
    ap.add_argument("--augment", action="store_true",
                    help="random level gain + biquad channel response per "
                         "pair (the reference's dormant augmentation, "
                         "denoise.cpp:670-718; see features.augment)")
    ap.add_argument("--augment-seed", type=int, default=0)
    ap.add_argument("--augment-highpass", action="store_true",
                    help="with --augment: also the fixed DC high-pass")
    ap.add_argument("--skip-existing", action="store_true",
                    help="skip pairs whose output .f32 already exists at "
                         "the full size AND whose .meta sidecar records the "
                         "same generation settings (resume a killed sweep; "
                         "augment draws stay per-job-index, so the records "
                         "are identical to an uninterrupted run; files "
                         "without a sidecar are regenerated)")
    args = ap.parse_args(argv)

    # Generation-settings signature, written to a `<out>.meta` sidecar so
    # --skip-existing never silently mixes records produced under different
    # flags (or an older record format) into one training set.
    sig = "v1 augment=%d seed=%d highpass=%d postfilter=%d" % (
        args.augment, args.augment_seed, args.augment_highpass,
        not args.no_postfilter)

    from percepnet_tpu.io.pcm import read_pcm16, write_pcm16

    jobs = []
    if args.pairs_file:
        with open(args.pairs_file) as f:
            for ln in f:
                parts = ln.split()
                if not parts:
                    continue
                clean, noisy = parts[0], parts[1]
                cnt = int(parts[2]) if len(parts) > 2 else args.count
                out = parts[3] if len(parts) > 3 else os.path.join(
                    args.out_dir,
                    os.path.splitext(os.path.basename(noisy))[0] + ".f32")
                jobs.append((clean, noisy, cnt, out))
    else:
        if len(args.args) != 4:
            ap.error("expected: clean.pcm noisy.pcm count out.f32")
        jobs.append((args.args[0], args.args[1], int(args.args[2]),
                     args.args[3]))
    # job index BEFORE sharding, so augmentation draws are shard-invariant
    jobs = [(i,) + j for i, j in enumerate(jobs)]
    jobs = jobs[args.shard_id :: args.num_shards]
    if args.skip_existing:
        def is_done(j):
            # 138 float32 fields per frame (denoise.cpp:761-773)
            if not (os.path.isfile(j[4])
                    and os.path.getsize(j[4]) == j[3] * 138 * 4):
                return False
            try:
                with open(j[4] + ".meta") as f:
                    return f.read().strip() == sig
            except OSError:
                return False  # no sidecar: unknown settings -> regenerate
        done = [j for j in jobs if is_done(j)]
        if done:
            print(f"--skip-existing: {len(done)}/{len(jobs)} already done")
        jobs = [j for j in jobs if j not in set(done)]

    def write_meta(out_p):
        with open(out_p + ".meta", "w") as f:
            f.write(sig + "\n")

    def maybe_augment(idx, clean, noisy):
        if not args.augment:
            return clean, noisy
        from percepnet_tpu.features import augment
        rng = np.random.default_rng((args.augment_seed, idx))
        return augment.augment_pair(clean, noisy, rng,
                                    highpass=args.augment_highpass)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.batch > 1 and not args.test and len(jobs) > 1:
        # group equal-count jobs into batched passes (one jit signature
        # per distinct count)
        from itertools import groupby
        for cnt, group in groupby(sorted(jobs, key=lambda j: j[3]),
                                  key=lambda j: j[3]):
            group = list(group)
            for i in range(0, len(group), args.batch):
                chunk = group[i : i + args.batch]
                pairs = [maybe_augment(idx, read_pcm16(c), read_pcm16(n))
                         for idx, c, n, _, _ in chunk]
                recs = generate_batch(
                    [p[0] for p in pairs], [p[1] for p in pairs], cnt,
                    apply_postfilter=not args.no_postfilter)
                for rec, (_, _, _, _, out_p) in zip(recs, chunk):
                    rec.astype(np.float32).tofile(out_p)
                    write_meta(out_p)
                print(f"{chunk[0][4]} .. {chunk[-1][4]}: "
                      f"{len(chunk)} x {cnt} frames", flush=True)
        return
    for idx, clean_p, noisy_p, cnt, out_p in jobs:
        clean, noisy = maybe_augment(idx, read_pcm16(clean_p),
                                     read_pcm16(noisy_p))
        records, test = generate_pair(
            clean, noisy, cnt,
            apply_postfilter=not args.no_postfilter, oracle=args.test)
        records.astype(np.float32).tofile(out_p)
        write_meta(out_p)
        print(f"{out_p}: {records.shape[0]} frames")
        if test is not None:
            base = os.path.dirname(out_p) or "."
            write_pcm16(os.path.join(base, "test_output.pcm"),
                        test["output"])
            write_pcm16(os.path.join(base, "test_input.pcm"), test["input"])


if __name__ == "__main__":
    main()
