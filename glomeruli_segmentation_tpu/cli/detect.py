"""CLI: whole-slide glomerulus detection.

Flag surface mirrors ``module/faster-rcnn/detect_glomus_test.py:385-405``.
``--model`` points at a directory holding either a native checkpoint
(``detector.ckpt.pth`` — our format, a torch-style pickle of flax params)
or the reference's ``frozen_inference_graph.pb`` (weights extracted via
:mod:`..convert.pb_import`).
"""
import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Load RoI")
    parser.add_argument("--model", type=str, required=True,
                        help="model directory")
    parser.add_argument("--target_list", type=str, required=True)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--staining", dest="data_category", type=str,
                        default="OPT_PAM")
    parser.add_argument("--output_dir", type=str, default="./output")
    parser.add_argument("--output_file_ext", type=str, default="_GlomusList")
    parser.add_argument("--window_size", type=int, default=None)
    parser.add_argument("--overlap_ratio", type=float, default=None)
    parser.add_argument("--conf_threshold", type=float, default=0.6)
    parser.add_argument("--model_name", default="frozen_inference_graph.pb")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--resume", action="store_true",
                        help="skip slides already present in the timing log "
                             "and append to existing outputs")
    return parser


def load_backend(model_dir: str, model_name: str, batch_size: int):
    from ..pipeline.detect import JaxDetectorBackend

    native_ckpt = os.path.join(model_dir, "detector.ckpt.pth")
    if os.path.isfile(native_ckpt):
        import jax.numpy as jnp
        import jax

        from ..convert.torch_pickle import load_torch_pickle

        blob = load_torch_pickle(native_ckpt)
        variables = jax.tree.map(jnp.asarray, blob["variables"])
        config = None
        if "config" in blob:
            from ..models.faster_rcnn import FasterRCNNConfig

            config = FasterRCNNConfig(**blob["config"])
        return JaxDetectorBackend(variables, config, batch_size)

    pb_path = os.path.join(model_dir, model_name)
    if os.path.isfile(pb_path):
        raise SystemExit(
            f"{pb_path}: automatic frozen-graph import requires a weight "
            "mapping for its architecture; extract constants with "
            "glomeruli_segmentation_tpu.convert.pb_import and train/convert "
            "a native detector checkpoint (detector.ckpt.pth)")
    raise SystemExit(f"no detector model found in {model_dir}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..pipeline.detect import GlomusDetector

    backend = load_backend(args.model, args.model_name, args.batch_size)
    detector = GlomusDetector(args.data_category, args.target_list,
                              args.data_dir, args.output_dir,
                              args.output_file_ext, args.window_size,
                              args.overlap_ratio, args.conf_threshold,
                              args.batch_size, resume=args.resume)
    detector.split_all(backend)


if __name__ == "__main__":
    main()
