from .metrics import (
    eval_mse_A,
    eval_ubo_B,
    variational_ubo,
    train_logvar,
    train_mvgauss_B,
    eval_bpp_mvgauss_B,
    compute_bpp_mvgauss_B,
    sensitivity_to_edge_noise,
    compute_train_kld,
    nats2bpp,
)
from .visualize import (
    one_to_three_channels,
    save_image_grid,
    visualize_data,
)
from .fid import compute_fid, eval_fid_B, frechet_distance, \
    random_feature_extractor
from .diversity import eval_z_diversity, z_diversity_stats
