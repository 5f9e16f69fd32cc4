#!/usr/bin/env python
"""Root evaluation CLI — same invocation shape as the reference:

    python test.py --chk_path <ckpt> --dataroot <path> --metric {bpp,mse,visual,noise_sens}
"""

from domain_transfer_gan_tpu.cli.test import test_model

if __name__ == "__main__":
    test_model()
