"""CLI: ESPNet training.

Flag surface mirrors ``module/espnet/train/main.py:450-477``.
"""
from argparse import ArgumentParser

from ..train.espnet_train import train_validate_segmentation


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    parser.add_argument("--model", default="ESPNet")
    parser.add_argument("--data_dir", default="./city")
    parser.add_argument("--inWidth", type=int, default=1024)
    parser.add_argument("--inHeight", type=int, default=512)
    parser.add_argument("--scaleIn", type=int, default=8,
                        help="8 for ESPNet-C, 1 for ESPNet")
    parser.add_argument("--max_epochs", type=int, default=300)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--step_loss", type=int, default=100)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--savedir", default="./results_enc_")
    parser.add_argument("--visualizeNet", type=bool, default=True)
    parser.add_argument("--resume", type=bool, default=False)
    parser.add_argument("--classes", type=int, default=20)
    parser.add_argument("--cached_data_file", default="city.p")
    parser.add_argument("--logFile", default="trainValLog.txt")
    parser.add_argument("--gpu_id", default=0, type=int,
                        help="kept for reference CLI compatibility")
    parser.add_argument("--decoder", type=bool, default=False)
    parser.add_argument("--pretrained",
                        default="../pretrained/encoder/espnet_p_2_q_8.pth")
    parser.add_argument("--p", default=2, type=int)
    parser.add_argument("--q", default=8, type=int)
    parser.add_argument("--resumeLoc", default="checkpoint.pth.tar")
    # TPU-native extras
    parser.add_argument("--weight_decay", type=float, default=5e-4,
                        help="coupled L2 weight decay (reference default "
                             "5e-4, module/espnet/train/main.py:382)")
    parser.add_argument("--data_parallel", type=int, default=0,
                        help="shard batches over an N-device mesh "
                             "(0 = single device, -1 = all devices)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute on the MXU; parameters, "
                             "optimizer state and BN statistics stay "
                             "float32 (default: full float32, matching "
                             "the reference recipe)")
    parser.add_argument("--prefetch", type=int, default=1,
                        help="batches staged ahead of the device step by "
                             "the loader's producer thread (the torch "
                             "DataLoader's worker prefetch); 0 = "
                             "synchronous loading")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host: coordinator address host:port "
                             "(or GSEG_COORDINATOR); combine with "
                             "--data_parallel -1 to span the global mesh")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="multi-host: total process count "
                             "(or GSEG_NUM_PROCESSES)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="multi-host: this process's rank "
                             "(or GSEG_PROCESS_ID)")
    return parser


def main(argv=None):
    train_validate_segmentation(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
