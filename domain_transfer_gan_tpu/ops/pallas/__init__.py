from .instance_norm import instance_norm_pallas, pallas_supported
