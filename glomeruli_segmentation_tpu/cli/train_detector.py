"""CLI: train the whole-slide glomerulus detector.

Native replacement for the TF OD API training flow of the companion
``glomeruli_detection`` repo (the reference tree only ships the frozen
inference graph).  Consumes the same annotated-slide layout as
``make_seg_data``: ``<data_dir>/<staining_dir>/<patient>/{*.ndpi,
annotations/*.xml}``.
"""
import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train glomerulus detector")
    parser.add_argument("--staining", default="OPT_PAS")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--target_list", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--backbone", default="resnet50",
                        choices=["resnet50", "tiny"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute on the MXU for the native "
                             "detector; params, BN statistics and box "
                             "math stay float32 (default: full float32)")
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="shard window batches over an N-device mesh "
                             "(0 = off, -1 = all devices); params and "
                             "optimizer state replicate")
    parser.add_argument("--finetune_pb", default=None,
                        help="fine-tune the reference's downloaded OD-API "
                             "frozen graph (frozen_inference_graph.pb) "
                             "instead of training the native detector; "
                             "saves od_api_detector.ckpt.pth")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..models.faster_rcnn import FasterRCNNConfig
    from ..train.detector_driver import DetectorTrainConfig, train_detector

    config = DetectorTrainConfig(
        image_size=args.image_size, batch_size=args.batch_size,
        steps=args.steps, lr=args.lr, seed=args.seed)
    if args.finetune_pb:
        from ..train.od_api_finetune import finetune_od_api

        path = finetune_od_api(args.staining, args.data_dir,
                               args.target_list, args.output_dir, config,
                               pb_path=args.finetune_pb,
                               data_parallel=args.data_parallel)
        print(f"saved {path}")
        return
    model_config = FasterRCNNConfig(
        image_size=(args.image_size, args.image_size),
        backbone=args.backbone)
    path = train_detector(args.staining, args.data_dir, args.target_list,
                          args.output_dir, config, model_config,
                          data_parallel=args.data_parallel, bf16=args.bf16)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
