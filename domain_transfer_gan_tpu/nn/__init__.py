from .norms import InstanceNorm, CondInstanceNorm, make_norm
from .blocks import ResnetBlock, CINResnetBlock
from .networks import (
    CINResnetGenerator,
    ResnetGenerator,
    Discriminator,
    DiscriminatorEdges,
    CINDiscriminator,
    DiscriminatorLatent,
    LatentEncoder,
    define_G,
    define_stochastic_G,
    define_D_A,
    define_D_B,
    define_LAT_D,
    define_E,
    count_params,
    print_network,
)
