#!/usr/bin/env python
"""Root training CLI — same invocation shape as the reference:

    python train.py --dataroot <path> --name <exp> [flags...]

See domain_transfer_gan_tpu/cli/train.py for the driver and
domain_transfer_gan_tpu/config.py for the full flag surface.
"""

from domain_transfer_gan_tpu.cli.train import train_model

if __name__ == "__main__":
    train_model()
