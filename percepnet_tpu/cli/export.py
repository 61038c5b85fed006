"""Export weights for C++ deployment: the `dump_percepnet.py` equivalent.

Usage:
  python -m percepnet_tpu export checkpoint.npz src/nnet_data.cpp
  python -m percepnet_tpu export model.pt weights.npz   # torch -> native

The .cpp output is a drop-in `nnet_data.cpp` for the reference build
(dump_percepnet.py:128-155 layout), closing the same loop the reference
closes — train here, deploy to the C++ streaming runtime.  Exporting to
.npz produces the native weight artifact instead.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(prog="percepnet-tpu export",
                                 description=__doc__.splitlines()[0])
    ap.add_argument("src", help="checkpoint .npz / params .npz / torch .pt")
    ap.add_argument("dst", help="output: nnet_data .cpp or params .npz")
    args = ap.parse_args(argv)

    from percepnet_tpu.cli.enhance import load_params
    params = load_params(args.src)

    if args.dst.endswith(".cpp"):
        from percepnet_tpu.io.nnet_data import emit_nnet_data_cpp
        emit_nnet_data_cpp(params, args.dst)
    elif args.dst.endswith(".npz"):
        from percepnet_tpu.train.checkpoint import save_params_npz
        save_params_npz(args.dst, params)
    else:
        ap.error("destination must end in .cpp or .npz")
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
