"""A torch re-creation of the reference's module tree, used ONLY to test
checkpoint interop (utils.torch_interop).

These classes reproduce the reference's exact ``state_dict`` key names
(Sequential indices, ``conv_block`` + bare-index aliases, ``shift_conv``/
``scale_conv``, custom InstanceNorm ``scale``/``shift``) and its exact
forward math (biased InstanceNorm variance — modules.py:88; unbiased
CondInstanceNorm variance — modules.py:128) so that a checkpoint written
here is indistinguishable from one written by the reference, and a forward
pass here is the oracle for an imported-parameter forward in JAX.

Structure citations: CINResnetGenerator networks.py:149-197, ResnetGenerator
networks.py:203-252, Discriminator networks.py:308-349, Discriminator_edges
networks.py:352-393, DiscriminatorLatent networks.py:396-433, LatentEncoder
networks.py:438-483, blocks modules.py:139-235.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class RefInstanceNorm(nn.Module):
    """Biased-variance instance norm with scale/shift params."""

    def __init__(self, ch, eps=1e-5):
        super().__init__()
        self.scale = nn.Parameter(torch.randn(ch) * 0.02)
        self.shift = nn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):
        n, c, h, w = x.shape
        r = x.reshape(n, c, h * w)
        mean = r.mean(2, keepdim=True)
        cent = r - mean
        rstd = torch.rsqrt((cent ** 2).mean(2, keepdim=True) + self.eps)
        y = (cent * rstd).reshape(n, c, h, w)
        return y * self.scale[:, None, None] + self.shift[:, None, None]


class RefCIN(nn.Module):
    """Unbiased-variance conditional instance norm; scale/shift from 1x1
    convs on z (B, zdim, 1, 1)."""

    def __init__(self, ch, zdim, eps=1e-5):
        super().__init__()
        self.shift_conv = nn.Sequential(nn.Conv2d(zdim, ch, 1), nn.ReLU(True))
        self.scale_conv = nn.Sequential(nn.Conv2d(zdim, ch, 1), nn.ReLU(True))
        self.eps = eps

    def forward(self, x, z):
        shift = self.shift_conv(z)
        scale = self.scale_conv(z)
        n, c, h, w = x.shape
        r = x.reshape(n, c, h * w)
        mean = r.mean(2, keepdim=True)
        var = r.var(2, keepdim=True)  # unbiased
        y = ((r - mean) * torch.rsqrt(var + self.eps)).reshape(n, c, h, w)
        return y * scale + shift


class RefMerge(nn.Module):
    def __init__(self, module1, module2):
        super().__init__()
        self.module1 = module1
        self.module2 = module2

    def forward(self, x, z):
        return self.module2(self.module1(x), z)


def _two_input_forward(modules, x, z):
    for m in modules:
        if isinstance(m, (RefCIN, RefMerge, RefCinBlock)):
            x = m(x, z)
        else:
            x = m(x)
    return x


class RefCinBlock(nn.Module):
    """CINResnetBlock: conv_block registered first, then every member again
    under its bare index (the add_module alias loop, modules.py:145-146)."""

    def __init__(self, ch, zdim):
        super().__init__()
        members = [
            nn.ReflectionPad2d(1),
            RefMerge(nn.Conv2d(ch, ch, 3), RefCIN(ch, zdim)),
            nn.ReLU(True),
            nn.ReflectionPad2d(1),
            nn.Conv2d(ch, ch, 3),
            RefInstanceNorm(ch),
        ]
        self.conv_block = nn.ModuleList(members)
        for idx, m in enumerate(members):
            self.add_module(str(idx), m)
        self.relu = nn.ReLU(True)

    def forward(self, x, z):
        return self.relu(x + _two_input_forward(self.conv_block, x, z))


class RefBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3), nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3), RefInstanceNorm(ch))
        self.relu = nn.ReLU(True)

    def forward(self, x):
        return self.relu(x + self.conv_block(x))


class RefGenAB(nn.Module):
    def __init__(self, zdim, io, ngf):
        super().__init__()
        seq = [
            nn.ReflectionPad2d(3),
            nn.Conv2d(io, ngf, 7),
            RefCIN(ngf, zdim),
            nn.ReLU(True),
            nn.Conv2d(ngf, 2 * ngf, 3, padding=1),
            RefCIN(2 * ngf, zdim),
            nn.ReLU(True),
            nn.Conv2d(2 * ngf, 4 * ngf, 3, stride=2, padding=1),
            RefCIN(4 * ngf, zdim),
            nn.ReLU(True),
            RefCinBlock(4 * ngf, zdim),
            RefCinBlock(4 * ngf, zdim),
            RefCinBlock(4 * ngf, zdim),
            nn.ConvTranspose2d(4 * ngf, 2 * ngf, 3, stride=2, padding=1,
                               output_padding=1),
            RefCIN(2 * ngf, zdim),
            nn.ReLU(True),
            nn.Conv2d(2 * ngf, ngf, 3, padding=1),
            RefCIN(ngf, zdim),
            nn.ReLU(True),
            nn.Conv2d(ngf, io, 7, padding=3),
            nn.Tanh(),
        ]
        self.model = nn.ModuleList(seq)

    def forward(self, x, z):
        return _two_input_forward(self.model, x, z)


class RefGenBA(nn.Module):
    def __init__(self, io, ngf):
        super().__init__()
        self.model = nn.Sequential(
            nn.ReflectionPad2d(3),
            nn.Conv2d(io, ngf, 7),
            RefInstanceNorm(ngf),
            nn.ReLU(True),
            nn.Conv2d(ngf, 2 * ngf, 3, padding=1),
            RefInstanceNorm(2 * ngf),
            nn.ReLU(True),
            nn.Conv2d(2 * ngf, 4 * ngf, 3, stride=2, padding=1),
            RefInstanceNorm(4 * ngf),
            nn.ReLU(True),
            RefBlock(4 * ngf),
            RefBlock(4 * ngf),
            RefBlock(4 * ngf),
            nn.ConvTranspose2d(4 * ngf, 2 * ngf, 3, stride=2, padding=1,
                               output_padding=1),
            RefInstanceNorm(2 * ngf),
            nn.ReLU(True),
            nn.Conv2d(2 * ngf, ngf, 3, padding=1),
            RefInstanceNorm(ngf),
            nn.ReLU(True),
            nn.Conv2d(ngf, io, 7, padding=3),
            nn.Tanh(),
        )

    def forward(self, x):
        return self.model(x)


class RefDB(nn.Module):
    """PatchGAN D_B: 4x4 convs."""

    def __init__(self, io, ndf):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(io, ndf, 4, stride=2, padding=1),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(ndf, 2 * ndf, 4, stride=2, padding=1),
            RefInstanceNorm(2 * ndf),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(2 * ndf, 4 * ndf, 4, stride=1, padding=1),
            RefInstanceNorm(4 * ndf),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(4 * ndf, 4 * ndf, 4, stride=1, padding=1),
            RefInstanceNorm(4 * ndf),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(4 * ndf, 1, 4, stride=1, padding=1),
        )

    def forward(self, x):
        return self.model(x)


class RefDA(nn.Module):
    """Global D_A: 3x3 stride-2 convs then a valid 4x4."""

    def __init__(self, io, ndf=32):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(io, ndf, 3, stride=2, padding=1),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(ndf, 2 * ndf, 3, stride=2, padding=1),
            RefInstanceNorm(2 * ndf),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(2 * ndf, 4 * ndf, 3, stride=2, padding=1),
            RefInstanceNorm(4 * ndf),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(4 * ndf, 4 * ndf, 3, stride=2, padding=1),
            RefInstanceNorm(4 * ndf),
            nn.LeakyReLU(0.2, True),
            nn.Conv2d(4 * ndf, 1, 4, stride=1, padding=0),
        )

    def forward(self, x):
        return self.model(x)


class RefDzB(nn.Module):
    def __init__(self, zdim, ndf):
        super().__init__()
        self.model = nn.Sequential(
            nn.Linear(zdim, ndf), nn.BatchNorm1d(ndf), nn.LeakyReLU(0.2, True),
            nn.Linear(ndf, ndf), nn.BatchNorm1d(ndf), nn.LeakyReLU(0.2, True),
            nn.Linear(ndf, ndf), nn.BatchNorm1d(ndf), nn.LeakyReLU(0.2, True),
            nn.Linear(ndf, 1),
        )

    def forward(self, z):
        if z.dim() == 4:
            z = z.reshape(z.size(0), -1)
        return self.model(z)


class RefEB(nn.Module):
    def __init__(self, zdim, io, nef):
        super().__init__()
        self.conv_modules = nn.Sequential(
            nn.Conv2d(io, nef, 3, stride=2, padding=1),
            nn.ReLU(True),
            nn.Conv2d(nef, 2 * nef, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(2 * nef),
            nn.ReLU(True),
            nn.Conv2d(2 * nef, 4 * nef, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(4 * nef),
            nn.ReLU(True),
            nn.Conv2d(4 * nef, 8 * nef, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(8 * nef),
            nn.ReLU(True),
            nn.Conv2d(8 * nef, 8 * nef, 4, stride=1, padding=0, bias=False),
            nn.BatchNorm2d(8 * nef),
            nn.ReLU(True),
        )
        self.enc_mu = nn.Conv2d(8 * nef, zdim, 1)
        self.enc_logvar = nn.Conv2d(8 * nef, zdim, 1)

    def forward(self, x):
        h = self.conv_modules(x)
        mu, logvar = self.enc_mu(h), self.enc_logvar(h)
        return mu.reshape(mu.size(0), -1), logvar.reshape(logvar.size(0), -1)


def build_reference_nets(zdim=16, in_nc=3, out_nc=3, ngf=8, ndf=8, nef=8,
                         seed=0, aug=True):
    """Randomly-initialized reference-shaped nets (keys + math oracles)."""
    torch.manual_seed(seed)
    nets = {
        "netG_A_B": RefGenAB(zdim, in_nc, ngf),
        "netG_B_A": RefGenBA(out_nc, ngf),
        "netD_A": RefDA(in_nc, 32),
        "netD_B": RefDB(out_nc, ndf),
    }
    if aug:
        nets["netD_z_B"] = RefDzB(zdim, ndf)
        nets["netE_B"] = RefEB(zdim, in_nc + out_nc, nef)
    # non-default values in every tensor (incl. BN running stats)
    with torch.no_grad():
        for net in nets.values():
            for p in net.parameters():
                p.add_(0.01 * torch.randn_like(p))
            for b in net.buffers():
                if b.dtype.is_floating_point:
                    b.add_(0.05 * torch.rand_like(b))
    return nets


def reference_checkpoint(nets, aug=True, adam_steps=0, lr=2e-4, beta1=0.5,
                         seed=3):
    """A checkpoint dict exactly as reference model.py:293-303/750-764
    writes it; with adam_steps > 0 the optimizers carry real Adam state."""
    import itertools

    if aug:
        optims = {
            "optimizer_G_A": torch.optim.Adam(
                nets["netG_B_A"].parameters(), lr=lr, betas=(beta1, 0.999)),
            "optimizer_G_B": torch.optim.Adam(
                itertools.chain(nets["netG_A_B"].parameters(),
                                nets["netE_B"].parameters()),
                lr=lr, betas=(beta1, 0.999)),
            "optimizer_D_A": torch.optim.Adam(
                nets["netD_A"].parameters(), lr=lr / 5, betas=(beta1, 0.999)),
            "optimizer_D_B": torch.optim.Adam(
                itertools.chain(nets["netD_B"].parameters(),
                                nets["netD_z_B"].parameters()),
                lr=lr / 5, betas=(beta1, 0.999)),
        }
    else:
        optims = {
            "optimizer_G": torch.optim.Adam(
                itertools.chain(nets["netG_A_B"].parameters(),
                                nets["netG_B_A"].parameters()),
                lr=lr, betas=(beta1, 0.999)),
            "optimizer_D": torch.optim.Adam(
                itertools.chain(nets["netD_A"].parameters(),
                                nets["netD_B"].parameters()),
                lr=lr / 5, betas=(beta1, 0.999)),
        }
    torch.manual_seed(seed)
    for _ in range(adam_steps):
        for opt in optims.values():
            opt.zero_grad()
            for group in opt.param_groups:
                for p in group["params"]:
                    p.grad = torch.randn_like(p)
            opt.step()
    ckpt = {name: net.state_dict() for name, net in nets.items()}
    ckpt.update({name: opt.state_dict() for name, opt in optims.items()})
    return ckpt
