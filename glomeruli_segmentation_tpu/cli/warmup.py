"""CLI: precompile the production programs into the persistent cache.

TPU compiles here go through a remote AOT service where the pipeline's
big programs cost minutes each; the package points JAX at a persistent
on-disk cache (``__init__._configure_compilation_cache``), so warming it
once per machine/model makes every later ``gseg-*`` run start at full
speed.  The reference has no analogue (its TF1 session warms per process).

Programs warmed:

- the 5-fold ESPNet ensemble forward + the /8 stitch-gather variant at
  each crop bucket (multiples of 256, same bucketing as
  ``FusedSlideSegmenter.segment_slide``);
- the flat-transfer variants of both (the single-device production
  default): every quantized flat buffer length is its own program —
  one per eighth of the padded batch's byte size — so each requested
  ``--flat_eighths`` value compiles two more programs.  The default
  warms eighths 5-9, the sizes real crop batches land on (measured
  ~0.72-0.75 fill + slack); pass ``--flat_eighths 1 2 3 4 5 6 7 8 9``
  for full coverage or ``--transfer padded`` to skip;
- the detector at each window geometry (native ``detector.ckpt.pth`` or
  the reference's ``frozen_inference_graph.pb``), when ``--model`` is
  given.
"""
import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="precompile pipeline programs into the JAX cache")
    parser.add_argument("--segmentation_weights_dir", type=str, default=None,
                        help="directory holding espnet_fold{1..5}.pth")
    parser.add_argument("--folds", type=int, nargs="*", default=[1, 2, 3, 4, 5])
    parser.add_argument("--seg_batch_size", type=int, default=32)
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "xla", "fused", "packed"])
    parser.add_argument("--buckets", type=int, nargs="*", default=[512],
                        help="crop bucket sizes (multiples of 256) to warm")
    parser.add_argument("--transfer", default="both",
                        choices=["both", "padded", "flat"],
                        help="crop-transfer layouts to warm (flat is the "
                             "single-device production default)")
    parser.add_argument("--flat_eighths", type=int, nargs="*",
                        default=[5, 6, 7, 8, 9],
                        help="flat buffer lengths to warm, in eighths of "
                             "the padded batch bytes (each is a distinct "
                             "compiled program)")
    parser.add_argument("--pack_output", action="store_true",
                        help="warm the packed-readback variant of the "
                             "full-res program (matches gseg-e2e/"
                             "gseg-segment --pack_output)")
    parser.add_argument("--model", type=str, default=None,
                        help="detector model dir (optional)")
    parser.add_argument("--model_name", default=None,
                        help="detector file inside --model (default: "
                             "auto-discover; see gseg-detect --help)")
    parser.add_argument("--window_sizes", type=int, nargs="*", default=[1024],
                        help="detection window pixel sizes to warm")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="detection window batch size")
    parser.add_argument("--device_resize", action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    did = []
    if args.segmentation_weights_dir:
        from ..ops.preprocess import postprocess_nearest_host  # noqa: F401
        from ..pipeline.fused import EnsembleConfig, EnsembleSegmenter

        ckpts = [os.path.join(args.segmentation_weights_dir,
                              f"espnet_fold{k}.pth") for k in args.folds]
        ens = EnsembleSegmenter(
            EnsembleConfig(checkpoints=ckpts, folds=tuple(args.folds),
                           batch_size=args.seg_batch_size,
                           pack_output=args.pack_output),
            engine=args.engine)
        bs = args.seg_batch_size
        for bucket in args.buckets:
            hs = np.full(bs, bucket - 62, np.int32)
            ys = np.zeros((bs, bucket // 8), np.int32)
            xs = np.zeros((bs, bucket // 8), np.int32)
            if args.transfer in ("both", "padded"):
                padded = np.zeros((bs, bucket, bucket, 3), np.uint8)
                print(f"warming ensemble bucket {bucket} (full-res path)...",
                      flush=True)
                ens.segment_batch_padded(padded, hs, hs)
                print(f"warming ensemble bucket {bucket} (/8 gather "
                      "path)...", flush=True)
                ens.segment_batch_gather(padded, hs, hs, ys, xs)
                did.append(f"ensemble@{bucket}")
            if args.transfer in ("both", "flat"):
                # one program per quantized flat buffer length — the
                # quantum MUST be pack_crops_flat's own, or warmup compiles
                # lengths production never uses
                from ..ops.preprocess import flat_quantum

                quantum = flat_quantum(bs, bucket, bucket)
                offs = np.zeros(bs, np.int32)
                ones = np.ones(bs, np.int32)
                for k in args.flat_eighths:
                    flat = np.zeros(k * quantum, np.uint8)
                    print(f"warming ensemble bucket {bucket} flat {k}/8 "
                          "(full-res + /8 gather)...", flush=True)
                    np.asarray(ens.submit_batch_flat(
                        flat, offs, ones, ones, bucket, bucket))
                    np.asarray(ens.submit_batch_gather_flat(
                        flat, offs, ones, ones, ys, xs, bucket, bucket))
                    did.append(f"ensemble@{bucket}:flat{k}/8")

    if args.model:
        from .detect import load_backend

        backend = load_backend(args.model, args.model_name, args.batch_size,
                               od_api_overrides={
                                   "device_resize": args.device_resize})
        for wsize in args.window_sizes:
            print(f"warming detector window {wsize}...", flush=True)
            windows = np.zeros((args.batch_size, wsize, wsize, 3), np.uint8)
            backend.detect_batch(windows)
            did.append(f"detector@{wsize}")

    if not did:
        raise SystemExit("nothing to warm: pass --segmentation_weights_dir "
                         "and/or --model")
    print("warmed:", ", ".join(did))


if __name__ == "__main__":
    main()
