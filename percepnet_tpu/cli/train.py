"""Train PercepNet: the `rnn_train.py` equivalent, SPMD over a TPU mesh.

Usage:
  python -m percepnet_tpu train \
      --train-filelist train.lst --dev-filelist dev.lst \
      --config utils/DNS_Challenge.yaml --out-dir exp/run1

Filelists point at raw 138-float record files (featgen output).  Resumes
automatically from the newest checkpoint in --out-dir; --pretrain
warm-starts params only (rnn_train.py:520-526).

Multi-host: start one process per host with --distributed.  On TPU pods,
jax.distributed.initialize auto-detects the coordinator from the TPU env;
elsewhere (CPU/GPU clusters, and the 2-process CPU test in
tests/test_distributed.py) pass --coordinator host:port --num-processes N
--process-id I explicitly.  Data is host-sharded by process index:
--batch-size is the PER-PROCESS batch, and the global batch assembled on
the mesh is batch_size * num_processes.  Every process must take the same
number of steps/eval batches (give each the same-cardinality file shard),
or the collectives deadlock.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    ap = argparse.ArgumentParser(prog="percepnet-tpu train",
                                 description=__doc__.splitlines()[0])
    ap.add_argument("--train-filelist", required=True)
    ap.add_argument("--dev-filelist")
    ap.add_argument("--config", help="YAML config (DNS_Challenge.yaml keys)")
    ap.add_argument("--out-dir", default="exp")
    ap.add_argument("--pretrain", help="params .npz to warm-start from")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--coordinator",
                    help="coordinator host:port (omit on TPU pods — "
                         "auto-detected from the TPU env)")
    ap.add_argument("--num-processes", type=int)
    ap.add_argument("--process-id", type=int)
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--seq-len", type=int)
    ap.add_argument("--max-steps", type=int)
    ap.add_argument("--log1p-features", action="store_true",
                    help="log1p-compress energy features at the model "
                         "boundary (fixes the reference's saturated input "
                         "stack; enhance must pass --log1p too; not "
                         "exportable to the C++ runtime)")
    ap.add_argument("--gain-mse-weight", type=float,
                    help="extra linear-domain gain MSE loss term weight "
                         "(default 0 = reference-faithful loss; see "
                         "train.loss.percepnet_loss)")
    ap.add_argument("--log-interval", type=int)
    ap.add_argument("--no-tensorboard", action="store_true")
    ap.add_argument("--watchdog", type=float, metavar="SECS",
                    help="exit(17) if no step completes in SECS (wedged "
                         "device/tunnel); run under a supervisor loop — "
                         "restart resumes from the last checkpoint")
    ap.add_argument("--device-data-mb", type=int, default=4096,
                    help="keep the whole record corpus resident on the "
                         "accelerator when it fits in this budget (only "
                         "int32 indices cross the host link per step; "
                         "0 disables; single-process only)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    import jax
    if args.distributed:
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()

    from percepnet_tpu.train import Trainer, TrainConfig
    from percepnet_tpu.train import datasets

    overrides = {"out_dir": args.out_dir}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.seq_len:
        overrides["seq_len"] = args.seq_len
    if args.max_steps:
        overrides["train_max_steps"] = args.max_steps
    if args.gain_mse_weight is not None:
        overrides["gain_mse_weight"] = args.gain_mse_weight
    if args.log1p_features:
        overrides["log1p_features"] = True
    if args.log_interval:
        overrides["log_interval_steps"] = args.log_interval
    if args.watchdog:
        overrides["watchdog_secs"] = args.watchdog
    cfg = (TrainConfig.from_yaml(args.config, **overrides)
           if args.config else TrainConfig(**overrides))

    log = logging.getLogger("percepnet_tpu.train")
    shard, nshards = jax.process_index(), jax.process_count()
    train_files = datasets.read_filelist(args.train_filelist)

    train_set = datasets.RecordListDataset(
        train_files, cfg.seq_len, shard_id=shard, num_shards=nshards)
    dev_set = None
    if args.dev_filelist:
        dev_set = datasets.RecordListDataset(
            datasets.read_filelist(args.dev_filelist), cfg.seq_len,
            shard_id=shard, num_shards=nshards)

    record_bytes = cfg.seq_len * 138 * 4
    total_mb = (len(train_set) + (len(dev_set) if dev_set else 0)) \
        * record_bytes // 2**20
    device_data = device_dev = None
    dev_batches = []
    if args.device_data_mb and total_mb <= args.device_data_mb \
            and nshards == 1:
        # device-resident corpus: one upload, index-only steps (the
        # host->device link is often the training bottleneck — measured
        # 118 MB/s tunnel vs 141 MB/step at the recipe shape)
        device_data = datasets.load_all_chunks(train_set)
        train_iter = datasets.index_iterator(
            len(train_set), cfg.batch_size, seed=cfg.seed)
        if dev_set:
            device_dev = datasets.load_all_chunks(dev_set)
            dev_batches = list(datasets.index_iterator(
                len(dev_set), cfg.batch_size, shuffle=False, epochs=1))
        log.info("device-resident corpus: %d MB, %d train + %d dev chunks",
                 total_mb, len(train_set), len(dev_set) if dev_set else 0)
    else:
        from percepnet_tpu.io import native
        if native.available():
            train_iter = native.NativeBatchLoader(
                train_files, cfg.seq_len, cfg.batch_size,
                shard_id=shard, num_shards=nshards, seed=cfg.seed)
            log.info("using native C++ batch loader (%d chunks)",
                     train_iter.num_chunks())
        else:
            train_iter = datasets.batch_iterator(
                train_set, cfg.batch_size, seed=cfg.seed)
        if dev_set:
            dev_batches = list(datasets.batch_iterator(
                dev_set, cfg.batch_size, shuffle=False, epochs=1))

    trainer = Trainer(cfg, train_iter, dev_batches,
                      tensorboard=not args.no_tensorboard,
                      device_data=device_data, device_dev=device_dev)
    if not args.no_resume:
        trainer.restore()
    if args.pretrain and int(jax.device_get(trainer.state.step)) == 0:
        trainer.load_pretrained(args.pretrain)
    trainer.run()


if __name__ == "__main__":
    main()
