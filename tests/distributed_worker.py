"""One process of a (possibly multi-process) data-parallel training run.

Launched by ``tests/test_distributed.py`` — both for the single-process
reference run and for each rank of the two-process run, so the compared
runs share every line of code.  ``--trainer espnet``: tiny ESPNet
(p=1, q=2), one training shape + one validation shape to bound CPU
compile time.  ``--trainer segformer``: the GTCS fine-tuning loop at
input_size 96.

Not a pytest file (no ``test_`` prefix): executed via subprocess with
``GSEG_PLATFORM=cpu`` / ``GSEG_CPU_DEVICES=<n>`` in the environment.
"""
import argparse


def small_loaders(args):
    """One shared geometry for all five scale loaders (single compile)."""
    from glomeruli_segmentation_tpu.data import transforms as T
    from glomeruli_segmentation_tpu.data.dataset import (
        DataLoader,
        SegmentationDataset,
    )

    def build(data):
        mean, std = data["mean"], data["std"]

        def pipe(crop):
            steps = [T.Normalize(mean, std), T.Scale(64, 32)]
            if crop:
                steps.append(T.RandomCropResize(crop))
            steps += [T.RandomFlip(), T.ToTensor(args.scaleIn)]
            return T.Compose(steps)

        def mk(tf, seed):
            return DataLoader(
                SegmentationDataset(data["trainIm"], data["trainAnnot"], tf),
                args.batch_size, num_workers=0, seed=seed)

        return {
            "scale1": mk(pipe(8), 1),
            "scale2": mk(pipe(8), 2),
            "scale4": mk(pipe(None), 4),
            "scale3": mk(pipe(4), 3),
            "main": mk(pipe(4), 0),
            "val": DataLoader(
                SegmentationDataset(data["valIm"], data["valAnnot"],
                                    T.Compose([T.Normalize(mean, std),
                                               T.Scale(64, 32),
                                               T.ToTensor(args.scaleIn)])),
                args.batch_size, shuffle=False, num_workers=0),
        }

    return build


def run_espnet(a):
    from glomeruli_segmentation_tpu.cli.train import build_parser
    from glomeruli_segmentation_tpu.train.espnet_train import EspnetTrainer

    args = build_parser().parse_args([
        "--data_dir", a.data_dir,
        "--cached_data_file", a.cached_data_file,
        "--savedir", a.savedir,
        "--classes", "5", "--batch_size", "8", "--max_epochs", "1",
        "--scaleIn", "1", "--p", "1", "--q", "2",
        "--data_parallel", "-1",
    ])
    args.decoder = True
    args.pretrained = None
    args.coordinator = a.coordinator
    args.num_processes = a.num_processes
    args.process_id = a.process_id

    trainer = EspnetTrainer(args)
    trainer.build_loaders = small_loaders(args)
    trainer.run()


def run_segformer(a):
    from glomeruli_segmentation_tpu.cli.segformer_train import build_parser
    from glomeruli_segmentation_tpu.train.segformer_train import (
        train_segformer,
    )

    argv = [
        "--site", "01_Todai", "--data_root", a.data_dir,
        "--data_date", "20260101", "--model_root", a.savedir,
        "--output_dir", "exp", "--fold", "1", "--max_epoch", "1",
        "--save_interval", "1", "--batch_size", "4", "--num_labels", "5",
        "--input_size", "96", "--dl_num_workers", "0",
        "--data_parallel", "-1",
    ]
    if a.coordinator:
        argv += ["--coordinator", a.coordinator,
                 "--num_processes", str(a.num_processes),
                 "--process_id", str(a.process_id)]
    train_segformer(build_parser().parse_args(argv))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainer", default="espnet",
                    choices=["espnet", "segformer"])
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--savedir", required=True)
    ap.add_argument("--cached_data_file", default="")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    a = ap.parse_args()

    if a.trainer == "espnet":
        run_espnet(a)
    else:
        run_segformer(a)

    import jax
    print("WORKER-DONE process", jax.process_index(), "of",
          jax.process_count(), "devices", len(jax.devices()))


if __name__ == "__main__":
    main()
