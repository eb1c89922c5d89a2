"""CLI: build train.txt / val.txt dataset lists
(ref ``module/espnet/train/create_dataset_txt.py``)."""
import argparse

from ..data.load_data import create_dataset_txt


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="This program makes trainval list")
    parser.add_argument("--data_dir", type=str, required=True,
                        help="Set path to parent data directory")
    args = parser.parse_args(argv)
    create_dataset_txt(args.data_dir)


if __name__ == "__main__":
    main()
