"""The seven network architectures of the reference, as flax modules (NHWC).

Topology citations (file:line into /root/reference/augmented_cyclegan/):

- CINResnetGenerator   networks.py:149-197  (G_A->B, latent-conditioned)
- ResnetGenerator      networks.py:203-252  (G_B->A, deterministic)
- Discriminator        networks.py:308-349  (D_B, PatchGAN, RF 46px)
- Discriminator_edges  networks.py:352-393  (D_A, global scalar logit @64px)
- CINDiscriminator     networks.py:259-302  (defined upstream, never used)
- DiscriminatorLatent  networks.py:396-433  (D_z_B, MLP on z)
- LatentEncoder        networks.py:438-483  (E_B, conv -> (mu, logvar))

Both generators hardcode THREE residual blocks upstream even though the
factories pass n_blocks=9 (quirk Q1); here ``n_blocks`` is honored and
defaults to 3 for parity.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convs import conv_transpose2d_torch, reflect_pad2d
from ..parallel.hints import pin_batch_only
from .blocks import CINResnetBlock, ResnetBlock
from .init import conv_kernel_init, torch_linear_init
from .norms import BatchNorm1d, BatchNorm2d, CondInstanceNorm, InstanceNorm

Dtype = Any


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k, s, p, op) with exact torch geometry (see
    ops.convs.conv_transpose2d_torch)."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kinit = conv_kernel_init(self.init_scheme)
        w = self.param("kernel", kinit,
                       (self.kernel, self.kernel, x.shape[-1], self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32) if self.use_bias else None
        w = w.astype(self.dtype)
        return conv_transpose2d_torch(x.astype(self.dtype), w, b,
                                      stride=self.stride, padding=self.padding,
                                      output_padding=self.output_padding)


def _conv(features, k, s, p, use_bias, init_scheme, dtype, name):
    return nn.Conv(features, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                   use_bias=use_bias, kernel_init=conv_kernel_init(init_scheme),
                   bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class _NormRelu(nn.Module):
    """norm -> ReLU with the ReLU fused into the instance-norm kernel."""
    kind: str
    features: int
    init_scheme: str
    use_pallas: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "instance":
            return InstanceNorm(self.features, affine=True,
                                init_scheme=self.init_scheme,
                                use_pallas=self.use_pallas, fuse_relu=True,
                                name="norm")(x)
        x = BatchNorm2d(self.features, init_scheme=self.init_scheme,
                        dtype=self.dtype, name="norm")(x, train)
        return nn.relu(x)


class _NormLRelu(nn.Module):
    """norm -> LeakyReLU(0.2)."""
    kind: str
    features: int
    init_scheme: str
    use_pallas: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "instance":
            x = InstanceNorm(self.features, affine=True,
                             init_scheme=self.init_scheme,
                             use_pallas=self.use_pallas, name="norm")(x)
        else:
            x = BatchNorm2d(self.features, init_scheme=self.init_scheme,
                            dtype=self.dtype, name="norm")(x, train)
        return nn.leaky_relu(x, 0.2)


class CINResnetGenerator(nn.Module):
    """Latent-conditioned ResNet generator G_A->B (networks.py:149-197).

    Stem downsamples once (stride 2) to H/2, runs ``n_blocks`` CIN residual
    blocks at 4*ngf, then upsamples back.  Every norm layer is a CIN that
    injects z; final activation Tanh.
    """

    nlatent: int
    input_nc: int
    output_nc: int
    ngf: int = 32
    n_blocks: int = 3
    use_dropout: bool = False
    padding_type: str = "reflect"
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True, trunk_fn=None):
        # trunk_fn (trace-time injection by parallel.pipeline): when set,
        # the n_blocks residual trunk runs through the caller's pipelined
        # apply — same per-block math on the same params['block{i}']
        # subtrees — instead of the sequential loop below.
        if z.ndim == 4:  # accept reference-layout (B, nlatent, 1, 1)
            z = z.reshape(z.shape[0], -1)
        cin = lambda f, name: CondInstanceNorm(
            f, self.nlatent, init_scheme=self.init_scheme,
            use_pallas=self.use_pallas, fuse_relu=True, dtype=self.dtype,
            name=name)

        h = reflect_pad2d(x, 3)
        h = _conv(self.ngf, 7, 1, 0, True, self.init_scheme, self.dtype, "conv0")(h)
        h = cin(self.ngf, "cin0")(h, z)

        h = _conv(2 * self.ngf, 3, 1, 1, True, self.init_scheme, self.dtype, "conv1")(h)
        h = cin(2 * self.ngf, "cin1")(h, z)

        h = _conv(4 * self.ngf, 3, 2, 1, True, self.init_scheme, self.dtype, "conv2")(h)
        h = cin(4 * self.ngf, "cin2")(h, z)

        if trunk_fn is not None:
            h = trunk_fn(h, z)
        else:
            for i in range(self.n_blocks):
                h = CINResnetBlock(4 * self.ngf, self.nlatent,
                                   padding_type=self.padding_type,
                                   use_dropout=self.use_dropout,
                                   init_scheme=self.init_scheme,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype,
                                   name=f"block{i}")(h, z, train)

        h = TorchConvTranspose(2 * self.ngf, 3, 2, 1, 1,
                               init_scheme=self.init_scheme, dtype=self.dtype,
                               name="up0")(h)
        h = cin(2 * self.ngf, "cin3")(h, z)

        h = _conv(self.ngf, 3, 1, 1, True, self.init_scheme, self.dtype, "conv3")(h)
        h = cin(self.ngf, "cin4")(h, z)

        h = _conv(self.output_nc, 7, 1, 3, True, self.init_scheme, self.dtype, "conv4")(h)
        return jnp.tanh(h)


class ResnetGenerator(nn.Module):
    """Deterministic ResNet generator G_B->A (networks.py:203-252)."""

    input_nc: int
    output_nc: int
    ngf: int = 32
    n_blocks: int = 3
    norm: str = "instance"
    use_dropout: bool = False
    padding_type: str = "reflect"
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, trunk_fn=None):
        # trunk_fn: see CINResnetGenerator — pipelined trunk injection.
        nr = lambda f, name: _NormRelu(self.norm, f, self.init_scheme,
                                       self.use_pallas, self.dtype, name=name)
        h = reflect_pad2d(x, 3)
        h = _conv(self.ngf, 7, 1, 0, True, self.init_scheme, self.dtype, "conv0")(h)
        h = nr(self.ngf, "nr0")(h, train)
        h = _conv(2 * self.ngf, 3, 1, 1, True, self.init_scheme, self.dtype, "conv1")(h)
        h = nr(2 * self.ngf, "nr1")(h, train)
        h = _conv(4 * self.ngf, 3, 2, 1, True, self.init_scheme, self.dtype, "conv2")(h)
        h = nr(4 * self.ngf, "nr2")(h, train)
        if trunk_fn is not None:
            h = trunk_fn(h, None)
        else:
            for i in range(self.n_blocks):
                h = ResnetBlock(4 * self.ngf, padding_type=self.padding_type,
                                norm=self.norm, use_dropout=self.use_dropout,
                                init_scheme=self.init_scheme,
                                use_pallas=self.use_pallas, dtype=self.dtype,
                                name=f"block{i}")(h, train)
        h = TorchConvTranspose(2 * self.ngf, 3, 2, 1, 1,
                               init_scheme=self.init_scheme, dtype=self.dtype,
                               name="up0")(h)
        h = nr(2 * self.ngf, "nr3")(h, train)
        h = _conv(self.ngf, 3, 1, 1, True, self.init_scheme, self.dtype, "conv3")(h)
        h = nr(self.ngf, "nr4")(h, train)
        h = _conv(self.output_nc, 7, 1, 3, True, self.init_scheme, self.dtype, "conv4")(h)
        return jnp.tanh(h)


class Discriminator(nn.Module):
    """PatchGAN discriminator D_B (networks.py:308-349).  On 64x64 input
    emits a 13x13 grid of patch logits (receptive field 46px)."""

    input_nc: int
    ndf: int = 64
    norm: str = "instance"
    use_sigmoid: bool = False
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        nl = lambda f, name: _NormLRelu(self.norm, f, self.init_scheme,
                                        self.use_pallas, self.dtype, name=name)
        h = _conv(self.ndf, 4, 2, 1, True, self.init_scheme, self.dtype, "conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = _conv(2 * self.ndf, 4, 2, 1, True, self.init_scheme, self.dtype, "conv1")(h)
        h = nl(2 * self.ndf, "nl1")(h, train)
        h = _conv(4 * self.ndf, 4, 1, 1, True, self.init_scheme, self.dtype, "conv2")(h)
        h = nl(4 * self.ndf, "nl2")(h, train)
        h = _conv(4 * self.ndf, 4, 1, 1, True, self.init_scheme, self.dtype, "conv3")(h)
        h = nl(4 * self.ndf, "nl3")(h, train)
        h = _conv(1, 4, 1, 1, True, self.init_scheme, self.dtype, "conv4")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


class DiscriminatorEdges(nn.Module):
    """Global discriminator D_A (networks.py:352-393): four stride-2 3x3
    convs then a valid 4x4 conv -> a single scalar logit on 64x64 input."""

    input_nc: int
    ndf: int = 32
    norm: str = "instance"
    use_sigmoid: bool = False
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        nl = lambda f, name: _NormLRelu(self.norm, f, self.init_scheme,
                                        self.use_pallas, self.dtype, name=name)
        h = _conv(self.ndf, 3, 2, 1, True, self.init_scheme, self.dtype, "conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = _conv(2 * self.ndf, 3, 2, 1, True, self.init_scheme, self.dtype, "conv1")(h)
        h = nl(2 * self.ndf, "nl1")(h, train)
        h = _conv(4 * self.ndf, 3, 2, 1, True, self.init_scheme, self.dtype, "conv2")(h)
        h = nl(4 * self.ndf, "nl2")(h, train)
        h = _conv(4 * self.ndf, 3, 2, 1, True, self.init_scheme, self.dtype, "conv3")(h)
        h = nl(4 * self.ndf, "nl3")(h, train)
        # On a dp x sp mesh, keep the tiny 4x4 head (and its backward) off
        # the space axis — see parallel/hints.py.  Identity otherwise.
        h = pin_batch_only(h)
        h = _conv(1, 4, 1, 0, True, self.init_scheme, self.dtype, "conv4")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


class CINDiscriminator(nn.Module):
    """CIN-conditioned discriminator (networks.py:259-302).  Dead code in the
    reference (never instantiated) — provided for inventory parity."""

    nlatent: int
    input_nc: int
    ndf: int = 64
    use_sigmoid: bool = False
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        if z.ndim == 4:
            z = z.reshape(z.shape[0], -1)
        cin = lambda f, name: CondInstanceNorm(
            f, self.nlatent, init_scheme=self.init_scheme,
            use_pallas=self.use_pallas, dtype=self.dtype, name=name)
        h = _conv(self.ndf, 4, 2, 1, True, self.init_scheme, self.dtype, "conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = _conv(2 * self.ndf, 4, 2, 1, True, self.init_scheme, self.dtype, "conv1")(h)
        h = nn.leaky_relu(cin(2 * self.ndf, "cin1")(h, z), 0.2)
        h = _conv(4 * self.ndf, 4, 1, 1, True, self.init_scheme, self.dtype, "conv2")(h)
        h = nn.leaky_relu(cin(4 * self.ndf, "cin2")(h, z), 0.2)
        h = _conv(5 * self.ndf, 4, 1, 1, True, self.init_scheme, self.dtype, "conv3")(h)
        h = nn.leaky_relu(cin(5 * self.ndf, "cin3")(h, z), 0.2)
        h = _conv(1, 4, 1, 1, True, self.init_scheme, self.dtype, "conv4")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


class DiscriminatorLatent(nn.Module):
    """MLP latent discriminator D_z_B (networks.py:396-433):
    3x [Linear(ndf) + BatchNorm1d + LeakyReLU(0.2)] + Linear(1).

    Linear layers keep torch-default init under the 'reference' scheme
    (weights_init only matches Conv*/BatchNorm2d — quirk Q7).
    """

    nlatent: int
    ndf: int = 64
    use_sigmoid: bool = False
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        if z.ndim == 4:
            z = z.reshape(z.shape[0], self.nlatent)

        def dense(features, fan_in, name):
            if self.init_scheme == "reference":
                init = torch_linear_init(fan_in)
                return nn.Dense(features, kernel_init=init, bias_init=init,
                                dtype=self.dtype, name=name)
            return nn.Dense(features, dtype=self.dtype, name=name)

        h = dense(self.ndf, self.nlatent, "fc0")(z)
        h = nn.leaky_relu(BatchNorm1d(self.ndf, dtype=self.dtype, name="bn0")(h, train), 0.2)
        h = dense(self.ndf, self.ndf, "fc1")(h)
        h = nn.leaky_relu(BatchNorm1d(self.ndf, dtype=self.dtype, name="bn1")(h, train), 0.2)
        h = dense(self.ndf, self.ndf, "fc2")(h)
        h = nn.leaky_relu(BatchNorm1d(self.ndf, dtype=self.dtype, name="bn2")(h, train), 0.2)
        h = dense(1, self.ndf, "fc3")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


class LatentEncoder(nn.Module):
    """Conv latent encoder E_B (networks.py:438-483): four stride-2 3x3
    convs, a valid 4x4 conv, then 1x1 conv heads for (mu, logvar).

    Norm is hardcoded 'batch' by the caller (reference model.py:364).  The
    final flatten assumes the conv stack reduced H,W to 1x1, i.e. 64x64
    inputs (same constraint as the reference).  Set ``adaptive_pool`` to
    global-average larger feature maps instead (new capability).
    """

    nlatent: int
    input_nc: int
    nef: int = 32
    norm: str = "batch"
    adaptive_pool: bool = False
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        nr = lambda f, name: _NormRelu(self.norm, f, self.init_scheme,
                                       self.use_pallas, self.dtype, name=name)
        h = _conv(self.nef, 3, 2, 1, True, self.init_scheme, self.dtype, "conv0")(x)
        h = nn.relu(h)
        h = _conv(2 * self.nef, 3, 2, 1, False, self.init_scheme, self.dtype, "conv1")(h)
        h = nr(2 * self.nef, "nr1")(h, train)
        h = _conv(4 * self.nef, 3, 2, 1, False, self.init_scheme, self.dtype, "conv2")(h)
        h = nr(4 * self.nef, "nr2")(h, train)
        h = _conv(8 * self.nef, 3, 2, 1, False, self.init_scheme, self.dtype, "conv3")(h)
        h = nr(8 * self.nef, "nr3")(h, train)
        # On a dp x sp mesh, keep the head (4x4 -> 1x1 collapse, norm, mu/
        # logvar convs — and their backward) off the space axis; see
        # parallel/hints.py.  Identity otherwise.
        h = pin_batch_only(h)
        h = _conv(8 * self.nef, 4, 1, 0, False, self.init_scheme, self.dtype, "conv4")(h)
        h = nr(8 * self.nef, "nr4")(h, train)
        if self.adaptive_pool and (h.shape[1] > 1 or h.shape[2] > 1):
            h = jnp.mean(h, axis=(1, 2), keepdims=True)
        mu = _conv(self.nlatent, 1, 1, 0, True, self.init_scheme, self.dtype, "enc_mu")(h)
        logvar = _conv(self.nlatent, 1, 1, 0, True, self.init_scheme, self.dtype,
                       "enc_logvar")(h)
        return (mu.reshape(mu.shape[0], -1), logvar.reshape(logvar.shape[0], -1))


# ---------------------------------------------------------------------------
# Factories mirroring the reference's define_* surface (networks.py:33-127).
# They return configured module instances; parameter init happens at
# .init(...) time with the scheme baked into the module.
# ---------------------------------------------------------------------------

def define_G(input_nc, output_nc, ngf, norm="instance", use_dropout=False,
             n_blocks=3, init_scheme="reference", use_pallas=False,
             dtype=jnp.float32):
    return ResnetGenerator(input_nc=input_nc, output_nc=output_nc, ngf=ngf,
                           n_blocks=n_blocks, norm=norm, use_dropout=use_dropout,
                           init_scheme=init_scheme, use_pallas=use_pallas,
                           dtype=dtype)


def define_stochastic_G(nlatent, input_nc, output_nc, ngf, norm="instance",
                        use_dropout=False, n_blocks=3, init_scheme="reference",
                        use_pallas=False, dtype=jnp.float32):
    return CINResnetGenerator(nlatent=nlatent, input_nc=input_nc,
                              output_nc=output_nc, ngf=ngf, n_blocks=n_blocks,
                              use_dropout=use_dropout, init_scheme=init_scheme,
                              use_pallas=use_pallas, dtype=dtype)


def define_D_A(input_nc, ndf, norm="instance", use_sigmoid=False,
               init_scheme="reference", use_pallas=False, dtype=jnp.float32):
    return DiscriminatorEdges(input_nc=input_nc, ndf=ndf, norm=norm,
                              use_sigmoid=use_sigmoid, init_scheme=init_scheme,
                              use_pallas=use_pallas, dtype=dtype)


def define_D_B(input_nc, ndf, norm="instance", use_sigmoid=False,
               init_scheme="reference", use_pallas=False, dtype=jnp.float32):
    return Discriminator(input_nc=input_nc, ndf=ndf, norm=norm,
                         use_sigmoid=use_sigmoid, init_scheme=init_scheme,
                         use_pallas=use_pallas, dtype=dtype)


def define_LAT_D(nlatent, ndf, use_sigmoid=False, init_scheme="reference",
                 dtype=jnp.float32):
    return DiscriminatorLatent(nlatent=nlatent, ndf=ndf, use_sigmoid=use_sigmoid,
                               init_scheme=init_scheme, dtype=dtype)


def define_E(nlatent, input_nc, nef, norm="batch", init_scheme="reference",
             use_pallas=False, dtype=jnp.float32, adaptive_pool=False):
    return LatentEncoder(nlatent=nlatent, input_nc=input_nc, nef=nef, norm=norm,
                         adaptive_pool=adaptive_pool, init_scheme=init_scheme,
                         use_pallas=use_pallas, dtype=dtype)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def print_network(name: str, params, out_f=None):
    """Param count + name -> nets.txt (reference networks.py:130-137)."""
    n = count_params(params)
    if out_f is not None:
        out_f.write("%s\n" % name)
        out_f.write("Total number of parameters: %d\n" % n)
        out_f.flush()
    return n
