"""CLI: SegFormer GTCS testing/reporting
(flag surface mirrors ``module/SegFormer/test/test.py:175-206``)."""
import argparse

from ..pipeline.segformer_test import run_segformer_test


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="segformer")
    parser.add_argument("--num_labels", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--fold", type=int, required=True)
    parser.add_argument("--target_site", type=str,
                        choices=["01_Todai", "02_Kitano"], required=True)
    parser.add_argument("--model_site", type=str,
                        choices=["01_Todai", "02_Kitano"], required=True)
    parser.add_argument("--data_date", type=str, required=True)
    parser.add_argument("--model_base_path", type=str, required=True)
    parser.add_argument("--pretrained_model", type=str,
                        default="segformer/20220804_b4")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--save_image", type=int, default=0)
    parser.add_argument("--report_root_path", type=str, required=True)
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--detected_mode", type=int, default=0)
    parser.add_argument("--input_size", type=int, default=512)
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="shard crop batches over an N-device mesh "
                             "(0 = single device, -1 = all devices); "
                             "batch_size must be a multiple of N")
    return parser


def main(argv=None):
    run_segformer_test(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
