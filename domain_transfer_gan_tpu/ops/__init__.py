from .numerics import (
    gauss_reparametrize,
    log_prob_laplace,
    log_prob_gaussian,
    kld_std_gauss,
    criterion_gan,
    clip_grads_torchlike,
    global_norm,
)
from .convs import conv2d_torch, conv_transpose2d_torch, reflect_pad2d
