"""CLI: fused end-to-end slide pipeline (detect -> merge -> segment ->
stitch in one process).

One command replaces the reference's four-process chain
(``example/README.md:27-133``): per slide it emits the merged-detection
CSV, the per-crop labelme JSONs and the stitched ``{patient}_pred.jpg`` —
the same artifacts, no intermediate files between stages.
"""
import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="fused detect+merge+segment+stitch per slide")
    parser.add_argument("--model", type=str, required=True,
                        help="detector model dir (detector.ckpt.pth or "
                             "frozen_inference_graph.pb)")
    parser.add_argument("--target_list", type=str, required=True)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--staining", dest="data_category", type=str,
                        default="OPT_PAS")
    parser.add_argument("--output_dir", type=str, default="./output")
    parser.add_argument("--segmentation_weights_dir", type=str, default=None,
                        help="directory holding espnet_fold{1..5}.pth "
                             "(required unless --segformer_checkpoint)")
    parser.add_argument("--folds", type=int, nargs="*", default=[1, 2, 3, 4, 5])
    parser.add_argument("--segformer_checkpoint", type=str, default=None,
                        help="run the SegFormer/GTCS model family instead "
                             "of the 5-fold ESPNet ensemble: a "
                             "flax_model.pth, a checkpoint-N dir, or a "
                             "training output dir (best checkpoint found "
                             "via log.txt); per-crop artifacts become the "
                             "GTCS label PNGs (mode-'L' grayscale, the "
                             "staged chain's save_image format) and the "
                             "overlay uses the GTCS palette")
    parser.add_argument("--num_labels", type=int, default=None,
                        help="GTCS class count (SegFormer path; default: "
                             "recorded in the checkpoint)")
    parser.add_argument("--input_size", type=int, default=512,
                        help="SegFormer input resolution")
    parser.add_argument("--json_dir", type=str, default=None,
                        help="write per-crop labelme JSONs here "
                             "(default: <output_dir>/json)")
    parser.add_argument("--no_json", action="store_true",
                        help="skip per-crop labelme JSONs; unlocks the "
                             "device-side /8 stitch gather (full-res "
                             "class maps never cross the d2h link)")
    parser.add_argument("--window_size", type=int, default=2000)
    parser.add_argument("--overlap_ratio", type=float, default=0.1)
    parser.add_argument("--conf_threshold", type=float, default=0.2)
    parser.add_argument("--merge_conf_threshold", type=float, default=0.9)
    parser.add_argument("--merge_overlap_threshold", type=float, default=0.35)
    parser.add_argument("--batch_size", type=int, default=8)
    # crop batches amortize a ~32 ms/fold per-dispatch fixed cost
    # (BASELINE.md round-2 profile): 32 halves sec/slide vs 8 on real
    # slide populations while bounding pad waste on sparse slides
    parser.add_argument("--seg_batch_size", type=int, default=32)
    parser.add_argument("--model_name", default=None,
                        help="detector file inside --model (default: "
                             "auto-discover; see gseg-detect --help)")
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "xla", "fused", "packed"],
                        help="'fused' scans folds through the Pallas ESP "
                             "kernel; 'packed' runs all folds in one "
                             "block-diagonal forward (one pass over the "
                             "latency-bound small-channel segments); "
                             "'auto' (default) picks by the measured "
                             "batch-size crossover: packed below 96, "
                             "fold-scan above")
    parser.add_argument("--precision", default="default",
                        choices=["default", "high", "highest"])
    parser.add_argument("--mesh", default="auto", choices=["auto", "off"],
                        help="'auto' (default): on a multi-device host "
                             "with no explicit --fold_parallel/"
                             "--data_parallel, resolve the fold x data "
                             "mesh from the device count and fold count "
                             "(fold axis first — the measured multi-chip "
                             "lever, BASELINE.md round-4 profile) and "
                             "data-shard the detector's window batches; "
                             "single-device hosts are unaffected.  'off': "
                             "never auto-shard; only explicit flags build "
                             "a mesh")
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="shard detection windows and crop batches over "
                             "an N-device mesh (0 = off, -1 = all devices)")
    parser.add_argument("--fold_parallel", type=int, default=0,
                        help="shard the ensemble's FOLDS over N devices "
                             "(-1 = all devices left after --data_parallel; "
                             "composes into a fold x data mesh).  The only "
                             "axis that cuts the per-fold latency-bound "
                             "fixed cost at production batch sizes "
                             "(BASELINE.md round-3 profile); the ordered "
                             "combine is bit-identical to the sequential "
                             "fold loop")
    parser.add_argument("--min_dimension", type=int, default=600)
    parser.add_argument("--max_dimension", type=int, default=1024)
    parser.add_argument("--max_proposals", type=int, default=300)
    parser.add_argument("--device_resize", action="store_true",
                        help="fuse the keep-aspect window resize into the "
                             "device program (frozen-graph backend)")
    parser.add_argument("--cv2_resize", action="store_true",
                        help="cv2 half-pixel keep-aspect resize instead of "
                             "the frozen graph's TF1 scale*i sampling")
    parser.add_argument("--transfer", default="auto",
                        choices=["auto", "flat", "padded"],
                        help="crop batch transfer layout: 'flat' ships one "
                             "ragged byte buffer (crop content only, padded "
                             "view rebuilt on device — byte-identical); "
                             "'padded' ships the max-shape batch (required "
                             "under --data_parallel / --host_resize); "
                             "'auto' picks flat on a single device")
    parser.add_argument("--host_resize", action="store_true",
                        help="cv2-resize crops to the ESPNet input on host "
                             "before transfer (O(net input) bytes per crop "
                             "instead of O(crop); wins when the "
                             "host->device link is the bottleneck)")
    parser.add_argument("--pack_output", action="store_true",
                        help="pack the full-resolution class-map "
                             "readbacks (labelme-JSON path) 3 px/byte "
                             "before d2h — exact; opt in when the "
                             "device->host link is byte-limited")
    parser.add_argument("--no_overlay", action="store_true")
    parser.add_argument("--slide_pipeline", default="auto",
                        choices=["auto", "on", "off"],
                        help="cross-slide pipelining: detection of slide "
                             "N+1 / segmentation of N / artifact emission "
                             "of N-1 stream on three threads (artifacts "
                             "identical and identically ordered either "
                             "way).  'auto' (default) enables it when the "
                             "host has >=2 CPU cores — on a single-core "
                             "host the three host-side stages contend "
                             "with the device-dispatch thread and "
                             "measured a net LOSS on gigapixel slides "
                             "(BASELINE.md round-4 A/B)")
    parser.add_argument("--serial_slides", action="store_true",
                        help="alias for --slide_pipeline off")
    parser.add_argument("--resume", action="store_true",
                        help="skip slides already in the timing log and "
                             "append to the merged CSV instead of starting "
                             "fresh")
    return parser


def resolve_mesh_policy(args) -> None:
    """``--mesh auto`` (default): fill in ``args.fold_parallel`` /
    ``args.data_parallel`` from the device + fold count when the operator
    set neither — on an 8-chip host ``gseg-e2e``/``gseg-serve`` then use
    the measured fold x data layout with zero operator knowledge
    (``parallel/mesh.py::resolve_auto_mesh``; VERDICT r4 weak 5).
    Explicit flags always win; single-device hosts resolve to no mesh;
    the SegFormer path keeps its explicit-flag contract (the fold axis
    is an ensemble concept).  Call BEFORE ``load_backend`` so the
    detector's window data-parallelism resolves too.  Mutates ``args``."""
    if getattr(args, "mesh", "off") != "auto":
        return
    if args.fold_parallel or args.data_parallel:
        return  # operator picked a layout
    if args.engine != "auto":
        return  # an explicit engine pins its own (single-device) path
    if args.segformer_checkpoint:
        return
    import jax

    from ..parallel.mesh import auto_data_parallel, resolve_auto_mesh

    n = len(jax.devices())
    fold, data = resolve_auto_mesh(len(args.folds), args.seg_batch_size,
                                   n_devices=n)
    if fold:
        args.fold_parallel = fold
        args.data_parallel = data if data > 1 else 0
        print(f"--mesh auto: {n} devices -> fold x data = {fold} x "
              f"{max(data, 1)} (override with --fold_parallel/"
              f"--data_parallel, disable with --mesh off)")
    elif data > 1:
        # single fold: pure data parallelism
        args.data_parallel = data
        print(f"--mesh auto: {n} devices -> data parallel x {data}")
    # the detector's window batches ride their own pure data mesh, sized
    # to divide ITS batch (the seg data axis divides the seg batch and
    # may not divide the detect batch)
    det_dp = auto_data_parallel(args.batch_size, n_devices=n)
    if det_dp:
        args.detector_data_parallel = det_dp


def detector_data_parallel(args) -> int:
    """The detector's data-axis size: the shared --data_parallel flag,
    unless --mesh auto resolved a detector-specific one."""
    return getattr(args, "detector_data_parallel", 0) or args.data_parallel


def resolve_slide_pipeline(args) -> bool:
    """The --slide_pipeline policy, shared with gseg-serve: 'auto'
    enables the three-stage cross-slide overlap only on hosts with >=2
    CPU cores — with a single core the producer/emitter host work
    (window JPEG decode, overlay decode+encode) contends with the
    device-dispatch thread and measured a net loss on gigapixel slides,
    while multi-core hosts get the overlap for free (BASELINE.md
    round-4 A/B)."""
    if getattr(args, "serial_slides", False):
        return False
    mode = getattr(args, "slide_pipeline", "auto")
    if mode == "auto":
        # usable cores, not host cores: a cpuset-pinned container on a
        # big node must count as single-core here
        try:
            cores = len(os.sched_getaffinity(0))
        except AttributeError:  # non-Linux
            cores = os.cpu_count() or 1
        return cores >= 2
    return mode == "on"


def build_pipeline(args, backend):
    """Flags -> :class:`..pipeline.e2e.FusedEndToEnd` for either model
    family (5-fold ESPNet ensemble, or SegFormer/GTCS via
    ``--segformer_checkpoint``).  Shared with ``gseg-serve``."""
    from ..pipeline.e2e import FusedEndToEnd
    from ..pipeline.fused import EnsembleConfig, EnsembleSegmenter

    fold_parallel = getattr(args, "fold_parallel", 0)
    if args.segformer_checkpoint:
        # ESPNet-ensemble-only flags have no effect on the SegFormer
        # path; surface conflicting combinations instead of silently
        # ignoring them (advisor finding, round 3).  Checked BEFORE any
        # mesh construction so the conflict message wins over e.g. a
        # device-count error from --fold_parallel's mesh build.
        ignored = [name for name, val, default in (
            ("--segmentation_weights_dir", args.segmentation_weights_dir,
             None),
            ("--folds", tuple(args.folds), (1, 2, 3, 4, 5)),
            ("--engine", args.engine, "auto"),
            ("--precision", args.precision, "default"),
            ("--transfer", args.transfer, "auto"),
            ("--host_resize", args.host_resize, False),
            ("--pack_output", args.pack_output, False),
            ("--fold_parallel", fold_parallel, 0),
        ) if val != default]
        if ignored:
            raise SystemExit(
                "these flags apply only to the 5-fold ESPNet ensemble "
                "and conflict with --segformer_checkpoint: "
                + ", ".join(ignored))
    mesh = None
    if fold_parallel:
        from ..parallel.mesh import make_fold_mesh

        if args.engine != "auto":
            raise SystemExit("--fold_parallel selects the fold-parallel "
                             "engine; drop --engine")
        mesh = make_fold_mesh(fold_parallel, args.data_parallel,
                              args.seg_batch_size)
    elif args.data_parallel:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(None if args.data_parallel < 0
                         else args.data_parallel)
    if args.segformer_checkpoint:
        from ..palette import GTCS_PALETTE
        from ..pipeline.fused_segformer import (SegformerSlideConfig,
                                                SegformerSlideSegmenter,
                                                load_segformer_checkpoint)

        variables, ckpt_labels = load_segformer_checkpoint(
            args.segformer_checkpoint)
        segmenter = SegformerSlideSegmenter(
            variables, SegformerSlideConfig(
                num_labels=args.num_labels or ckpt_labels,
                input_size=args.input_size,
                batch_size=args.seg_batch_size), mesh=mesh)
        pipe = FusedEndToEnd(
            backend, data_category=args.data_category,
            window_size=args.window_size, overlap_ratio=args.overlap_ratio,
            detect_conf=args.conf_threshold,
            merge_conf=args.merge_conf_threshold,
            merge_overlap=args.merge_overlap_threshold,
            segmenter=segmenter, palette=GTCS_PALETTE, crop_artifact="png")
    else:
        if not args.segmentation_weights_dir:
            raise SystemExit("--segmentation_weights_dir is required "
                             "unless --segformer_checkpoint is given")
        ckpts = [os.path.join(args.segmentation_weights_dir,
                              f"espnet_fold{k}.pth") for k in args.folds]
        ensemble = EnsembleSegmenter(
            EnsembleConfig(checkpoints=ckpts, folds=tuple(args.folds),
                           batch_size=args.seg_batch_size,
                           precision=args.precision,
                           pack_output=args.pack_output),
            mesh=mesh,
            engine="fold_parallel" if fold_parallel else args.engine)
        pipe = FusedEndToEnd(
            backend, ensemble, data_category=args.data_category,
            window_size=args.window_size, overlap_ratio=args.overlap_ratio,
            detect_conf=args.conf_threshold,
            merge_conf=args.merge_conf_threshold,
            merge_overlap=args.merge_overlap_threshold,
            host_resize=args.host_resize, transfer=args.transfer)
    return pipe


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..utils.glomus_handler import GlomusHandler
    from ..utils.target_list import read_target_list
    from .detect import load_backend
    from ..pipeline.e2e import FusedEndToEnd

    resolve_mesh_policy(args)
    backend = load_backend(
        args.model, args.model_name, args.batch_size,
        od_api_overrides={"min_dimension": args.min_dimension,
                          "max_dimension": args.max_dimension,
                          "max_proposals": args.max_proposals,
                          "device_resize": args.device_resize,
                          "compat_tf1_resize": not args.cv2_resize},
        data_parallel=detector_data_parallel(args))
    pipe = build_pipeline(args, backend)

    staining_dir = GlomusHandler.get_staining_type(args.data_category)
    json_dir = (None if args.no_json
                else args.json_dir or os.path.join(args.output_dir, "json"))
    completed = FusedEndToEnd.prepare_output(
        args.output_dir, args.data_category, resume=args.resume)
    jobs = []
    for entry in read_target_list(args.target_list):
        if entry.is_comment:
            continue
        if entry.specimen_id in completed:
            print(f"skip {entry.specimen_id} (already processed)")
            continue
        target_dir = os.path.join(args.data_dir, staining_dir,
                                  entry.specimen_id)
        if not os.path.isdir(target_dir):
            continue
        for candidate in sorted(os.listdir(target_dir)):
            body, ext = os.path.splitext(candidate)
            if entry.file_name.find(body) < 0 or ext.lower() not in (
                    ".ndpi", ".tiff", ".tif", ".svs"):
                continue
            jobs.append((os.path.join(target_dir, candidate),
                         entry.specimen_id))
            break
    # cross-slide pipelining: detection of slide N+1 / segmentation of N /
    # emission of N-1 stream on three threads (pipeline/e2e.py
    # run_slides); a failing slide aborts the run after the in-flight
    # work drains (reference behavior: the staged chain stops on error)
    pipe.run_slides(jobs, args.output_dir, json_dir=json_dir,
                    write_overlay=not args.no_overlay, progress=True,
                    pipeline=resolve_slide_pipeline(args))


if __name__ == "__main__":
    main()
