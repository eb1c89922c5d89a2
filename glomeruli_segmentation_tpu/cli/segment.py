"""CLI for per-crop glomerular segmentation.

Mirrors the public flag surface of
``module/espnet/test/VisualizeResults_iou.py:292-321`` plus TPU-specific
extras (``--batch_size``, ``--fast``, ``--precision``).
"""
from argparse import ArgumentParser

from ..pipeline.segment import run_segment


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(
        description="Glomerular segmentation on the cropped images")
    parser.add_argument("--rgb_data_dir", required=True,
                        help="Parent directory of original glomerular images")
    parser.add_argument("--label_data_dir", default=None,
                        help="Parent directory of label images (optional)")
    parser.add_argument("--img_extn", default="PNG")
    parser.add_argument("--inWidth", type=int, default=1024)
    parser.add_argument("--inHeight", type=int, default=512)
    parser.add_argument("--scaleIn", type=int, default=1,
                        help="8 for ESPNet-C, 1 for ESPNet")
    parser.add_argument("--modelType", type=int, default=1,
                        help="1=ESPNet, 2=ESPNet-C")
    parser.add_argument("--savedir", default="./results")
    parser.add_argument("--gpu_id", default=-1, type=int,
                        help="kept for reference CLI compatibility; "
                             "device selection is automatic under JAX")
    parser.add_argument("--decoder", action="store_true")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--mean", required=True, nargs="*",
                        help="global BGR mean of training images")
    parser.add_argument("--std", required=True, nargs="*",
                        help="global BGR std of training images")
    parser.add_argument("--p", default=2, type=int)
    parser.add_argument("--q", default=8, type=int)
    parser.add_argument("--cityFormat", action="store_true")
    parser.add_argument("--colored", action="store_true")
    parser.add_argument("--overlay", action="store_true")
    parser.add_argument("--classes", default=5, type=int)
    parser.add_argument("--json_image_data", default="org",
                        choices=["org", "classmap"],
                        help="'org' embeds the original crop in the labelme "
                             "JSON (VisualizeResults_iou.py behaviour); "
                             "'classmap' embeds the relabeled class map the "
                             "WSI evaluator expects "
                             "(VisualizeResults_iou_pixel.py behaviour)")
    # TPU-native extras
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--skip_existing", action="store_true",
                        help="resume: skip crops whose output JSON exists. "
                             "Note: summary CSVs are rewritten and cover "
                             "only the crops processed in this run")
    parser.add_argument("--fast", action="store_true",
                        help="fused on-device preprocessing")
    parser.add_argument("--precision", default="highest",
                        choices=["default", "high", "highest"],
                        help="matmul precision; 'highest' matches the fp32 "
                             "reference, 'default' uses fast bf16 MXU passes")
    parser.add_argument("--engine", default="xla", choices=["xla", "fused"],
                        help="'fused' runs ESP blocks through the Pallas "
                             "kernel (TPU fast path)")
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="shard crop batches over an N-device mesh "
                             "(0 = single device, -1 = all devices); "
                             "batch_size must be a multiple of N")
    parser.add_argument("--pack_output", action="store_true",
                        help="pack class-map readbacks 3 px/byte (base-"
                             "classes) before d2h — exact; opt in when "
                             "the device->host link is byte-limited "
                             "(BASELINE.md round-3 probe)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.overlay:
        args.colored = True
    run_segment(args)


if __name__ == "__main__":
    main()
