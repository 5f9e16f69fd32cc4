"""Golden-value numerics regression guard.

The reference offers no published numbers, so these goldens pin OUR OWN
fixed-seed two-step aug_cycle_gan loss trajectory (CPU, 8 virtual devices,
highest matmul precision — the test platform from conftest).  A refactor
that silently changes training numerics (init, loss composition, optimizer
semantics, clipping, z handling) will move these values.

Tolerance is loose (rtol 2e-3) to absorb compiler/version-level float
reassociation while still catching semantic drift.  If a DELIBERATE
numerics change lands, regenerate with the snippet in this file's history.
"""

import numpy as np

import jax.numpy as jnp

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model

GOLDEN_STEP1 = {
    "D_A": 0.495518, "G_A": 0.998882, "Cyc_A": 0.499222,
    "Cyc_z_B": 0.818741, "KLD_z_B": 0.039249, "D_B": 0.499758,
    "G_B": 0.999801, "Cyc_B": 0.500479, "D_z_B": 0.518208,
}
GOLDEN_STEP2 = {
    "D_A": 0.486691, "G_A": 0.99748, "Cyc_A": 0.499223,
    "Cyc_z_B": 0.887089, "KLD_z_B": 0.028309, "D_B": 0.499615,
    "G_B": 0.999663, "Cyc_B": 0.500477, "D_z_B": 0.601962,
}


GOLDEN_STOCH = [
    {"D_A": 0.495518, "G_A": 0.998882, "Cyc_A": 0.499222,
     "D_B": 0.499758, "G_B": 0.999801, "Cyc_B": 0.500629},
    {"D_A": 0.486691, "G_A": 0.99748, "Cyc_A": 0.499223,
     "D_B": 0.499615, "G_B": 0.999666, "Cyc_B": 0.500673},
]
GOLDEN_CYCLE = [
    {"D_A": 0.495518, "G_A": 0.998882, "Cyc_A": 0.499222,
     "D_B": 0.499758, "G_B": 0.999858, "Cyc_B": 0.500487},
    {"D_A": 0.486691, "G_A": 0.99748, "Cyc_A": 0.499222,
     "D_B": 0.499615, "G_B": 0.999712, "Cyc_B": 0.500477},
]


def _run_two_steps(variant):
    cfg = TrainConfig(model=variant, grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, monitor_gnorm=True,
                      seed=1234)
    cfg.expr_dir = ""
    m = create_model(cfg, testing=True)
    rng = np.random.RandomState(42)
    A = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    return m.train_instance(A, B)[0], m.train_instance(A, B)[0]


def _check(goldens, losses):
    for golden, got in zip(goldens, losses):
        for k, v in golden.items():
            assert np.isclose(float(got[k]), v, rtol=2e-3, atol=2e-4), \
                f"{k}: {float(got[k])} != golden {v}"


def test_fixed_seed_loss_trajectory():
    _check((GOLDEN_STEP1, GOLDEN_STEP2), _run_two_steps("aug_cycle_gan"))


def test_fixed_seed_loss_trajectory_stoch():
    _check(GOLDEN_STOCH, _run_two_steps("stoch_cycle_gan"))


def test_fixed_seed_loss_trajectory_cycle_gan():
    _check(GOLDEN_CYCLE, _run_two_steps("cycle_gan"))
