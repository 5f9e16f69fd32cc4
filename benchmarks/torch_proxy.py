"""PyTorch proxy of the reference training step, used ONLY to measure the
baseline images/sec on this machine (no CUDA device exists here, so this is
a CPU proxy; BASELINE.md documents that the reference publishes no numbers).

This is an independent re-implementation of the *architecture spec* from
SURVEY.md §2.1 in modern torch — it is deliberately not a copy of the
reference code.  Functionally it performs the same work per step as
aug_cycle_gan's train_instance: shared forward, D losses/update on detached
fakes, G losses (incl. cycles + latent cycle) /update, Adam with per-net
grad clipping.
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class CIN(nn.Module):
    """Conditional instance norm: scale/shift = relu(1x1 conv of z)."""

    def __init__(self, ch, zdim):
        super().__init__()
        self.s = nn.Conv2d(zdim, ch, 1)
        self.t = nn.Conv2d(zdim, ch, 1)

    def forward(self, x, z):
        h = F.instance_norm(x)
        return h * F.relu(self.s(z)) + F.relu(self.t(z))


class CinBlock(nn.Module):
    def __init__(self, ch, zdim):
        super().__init__()
        # reflection-padded 3x3 convs like the reference's CINResnetBlock
        self.c1 = nn.Sequential(nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3))
        self.n1 = CIN(ch, zdim)
        self.c2 = nn.Sequential(nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3))
        self.n2 = nn.InstanceNorm2d(ch, affine=True)

    def forward(self, x, z):
        h = F.relu(self.n1(self.c1(x), z))
        h = self.n2(self.c2(h))
        return F.relu(x + h)


class GenAB(nn.Module):
    """CIN ResNet generator: 1x down, 3 blocks, 1x up, tanh."""

    def __init__(self, zdim=16, ch=32, io=3):
        super().__init__()
        self.stem = nn.ModuleList([
            nn.Sequential(nn.ReflectionPad2d(3), nn.Conv2d(io, ch, 7)),
            nn.Conv2d(ch, 2 * ch, 3, padding=1),
            nn.Conv2d(2 * ch, 4 * ch, 3, stride=2, padding=1)])
        self.cins = nn.ModuleList([CIN(ch, zdim), CIN(2 * ch, zdim),
                                   CIN(4 * ch, zdim)])
        self.blocks = nn.ModuleList([CinBlock(4 * ch, zdim) for _ in range(3)])
        self.up = nn.ConvTranspose2d(4 * ch, 2 * ch, 3, stride=2, padding=1,
                                     output_padding=1)
        self.cin_up = CIN(2 * ch, zdim)
        self.tail = nn.Conv2d(2 * ch, ch, 3, padding=1)
        self.cin_tail = CIN(ch, zdim)
        self.out = nn.Sequential(nn.ReflectionPad2d(3), nn.Conv2d(ch, io, 7))

    def forward(self, x, z):
        h = x
        for conv, cin in zip(self.stem, self.cins):
            h = F.relu(cin(conv(h), z))
        for b in self.blocks:
            h = b(h, z)
        h = F.relu(self.cin_up(self.up(h), z))
        h = F.relu(self.cin_tail(self.tail(h), z))
        return torch.tanh(self.out(h))


def gen_ba(ch=32, io=3):
    def blk(ci, co, **kw):
        return [nn.Conv2d(ci, co, 3, **kw), nn.InstanceNorm2d(co, affine=True),
                nn.ReLU()]
    layers = ([nn.ReflectionPad2d(3), nn.Conv2d(io, ch, 7),
               nn.InstanceNorm2d(ch, True), nn.ReLU()]
              + blk(ch, 2 * ch, padding=1)
              + blk(2 * ch, 4 * ch, stride=2, padding=1))
    for _ in range(3):
        layers += [ResBlock(4 * ch)]
    layers += [nn.ConvTranspose2d(4 * ch, 2 * ch, 3, 2, 1, 1),
               nn.InstanceNorm2d(2 * ch, True), nn.ReLU()]
    layers += blk(2 * ch, ch, padding=1)
    layers += [nn.ReflectionPad2d(3), nn.Conv2d(ch, io, 7), nn.Tanh()]
    return nn.Sequential(*layers)


class ResBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.f = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3), nn.ReLU(),
            nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3),
            nn.InstanceNorm2d(ch, True))

    def forward(self, x):
        return F.relu(x + self.f(x))


def disc_patch(ch=64, io=3):
    def blk(ci, co, s):
        return [nn.Conv2d(ci, co, 4, stride=s, padding=1),
                nn.InstanceNorm2d(co, True), nn.LeakyReLU(0.2)]
    return nn.Sequential(
        nn.Conv2d(io, ch, 4, 2, 1), nn.LeakyReLU(0.2),
        *blk(ch, 2 * ch, 2), *blk(2 * ch, 4 * ch, 1), *blk(4 * ch, 4 * ch, 1),
        nn.Conv2d(4 * ch, 1, 4, 1, 1))


def disc_global(ch=32, io=3):
    def blk(ci, co):
        return [nn.Conv2d(ci, co, 3, stride=2, padding=1),
                nn.InstanceNorm2d(co, True), nn.LeakyReLU(0.2)]
    return nn.Sequential(
        nn.Conv2d(io, ch, 3, 2, 1), nn.LeakyReLU(0.2),
        *blk(ch, 2 * ch), *blk(2 * ch, 4 * ch), *blk(4 * ch, 4 * ch),
        nn.Conv2d(4 * ch, 1, 4))


def disc_latent(zdim=16, ch=64):
    return nn.Sequential(
        nn.Linear(zdim, ch), nn.BatchNorm1d(ch), nn.LeakyReLU(0.2),
        nn.Linear(ch, ch), nn.BatchNorm1d(ch), nn.LeakyReLU(0.2),
        nn.Linear(ch, ch), nn.BatchNorm1d(ch), nn.LeakyReLU(0.2),
        nn.Linear(ch, 1))


class Encoder(nn.Module):
    def __init__(self, zdim=16, ch=32, io=6):
        super().__init__()
        def blk(ci, co, k=3, s=2, p=1):
            return [nn.Conv2d(ci, co, k, s, p, bias=False),
                    nn.BatchNorm2d(co), nn.ReLU()]
        self.body = nn.Sequential(
            nn.Conv2d(io, ch, 3, 2, 1), nn.ReLU(),
            *blk(ch, 2 * ch), *blk(2 * ch, 4 * ch), *blk(4 * ch, 8 * ch),
            *blk(8 * ch, 8 * ch, k=4, s=1, p=0))
        self.mu = nn.Conv2d(8 * ch, zdim, 1)
        self.lv = nn.Conv2d(8 * ch, zdim, 1)

    def forward(self, x):
        h = self.body(x)
        return self.mu(h).flatten(1), self.lv(h).flatten(1)


def reference_weights_init(m):
    """The reference's init scheme (networks.py:13-21 + custom-IN reset,
    quirk Q7): Conv* ~ N(0,0.02) bias 0; BatchNorm2d w~N(1,0.02) b=0;
    affine instance norms keep the reference's near-zero scale ~ N(0,0.02);
    Linear/BatchNorm1d keep torch defaults."""
    if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
        nn.init.normal_(m.weight, 0.0, 0.02)
        if m.bias is not None:
            nn.init.zeros_(m.bias)
    elif isinstance(m, nn.BatchNorm2d):
        nn.init.normal_(m.weight, 1.0, 0.02)
        nn.init.zeros_(m.bias)
    elif isinstance(m, nn.InstanceNorm2d) and m.affine:
        nn.init.normal_(m.weight, 0.0, 0.02)
        nn.init.zeros_(m.bias)


def build_nets(zdim=16, seed=0, init="reference", model="aug_cycle_gan"):
    """Nets for any of the three reference variants (train.py:157-166):
    aug = 6 nets; stoch_cycle_gan / cycle_gan = the 4 image nets only
    (reference model.py:75-124 — no encoder, no latent discriminator)."""
    torch.manual_seed(seed)
    nets = dict(g_ab=GenAB(zdim), g_ba=gen_ba(), d_a=disc_global(),
                d_b=disc_patch())
    if model == "aug_cycle_gan":
        nets.update(d_z=disc_latent(zdim), enc=Encoder(zdim))
    if init == "reference":
        for m in nets.values():
            m.apply(reference_weights_init)
    return nets


def make_optimizers(nets, lr=2e-4):
    """G optimizers at lr, D at lr/5, Adam betas (0.5, 0.999)."""
    g_params = [*nets["g_ab"].parameters(), *nets["g_ba"].parameters()]
    d_params = [*nets["d_a"].parameters(), *nets["d_b"].parameters()]
    if "enc" in nets:
        g_params += list(nets["enc"].parameters())
    if "d_z" in nets:
        d_params += list(nets["d_z"].parameters())
    opt_g = torch.optim.Adam(g_params, lr=lr, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d_params, lr=lr / 5.0, betas=(0.5, 0.999))
    return opt_g, opt_d


def train_step(nets, opt_g, opt_d, A, B, z, lambda_A=1.0, lambda_B=1.0,
               lambda_z_B=0.025, max_gnorm=500.0):
    """One two-phase aug_cycle_gan step (D on detached fakes, then G vs the
    updated D).  Returns a dict of float losses."""
    g_ab, g_ba = nets["g_ab"], nets["g_ba"]
    d_a, d_b, d_z, enc = nets["d_a"], nets["d_b"], nets["d_z"], nets["enc"]
    mse, l1 = F.mse_loss, F.l1_loss
    batch = A.shape[0]

    fake_B = g_ab(A, z)
    fake_A = g_ba(B)
    mu, lv = enc(torch.cat([fake_A, B], 1))
    post_z = mu[:, :, None, None]

    # D phase
    pa_f = d_a(fake_A.detach())
    pa_t = d_a(A)
    loss_d_a = 0.5 * (mse(pa_f, torch.zeros_like(pa_f))
                      + mse(pa_t, torch.ones_like(pa_t)))
    pb_f = d_b(fake_B.detach())
    pb_t = d_b(B)
    loss_d_b = 0.5 * (mse(pb_f, torch.zeros_like(pb_f))
                      + mse(pb_t, torch.ones_like(pb_t)))
    pz_f = d_z(post_z.detach().flatten(1))
    pz_t = d_z(z.flatten(1))
    loss_d_z = 0.5 * (mse(pz_f, torch.zeros_like(pz_f))
                      + mse(pz_t, torch.ones_like(pz_t)))
    ld = loss_d_a + loss_d_b + loss_d_z
    opt_d.zero_grad()
    ld.backward()
    for m in (d_a, d_b, d_z):
        torch.nn.utils.clip_grad_norm_(m.parameters(), max_gnorm)
    opt_d.step()

    # G phase (vs updated D)
    pa = d_a(fake_A)
    lg_a = mse(pa, torch.ones_like(pa))
    pb = d_b(fake_B)
    lg_b = mse(pb, torch.ones_like(pb))
    pz = d_z(post_z.flatten(1))
    lg_z = mse(pz, torch.ones_like(pz))
    rec_A = g_ba(fake_B)
    mu2, _ = enc(torch.cat([A, fake_B], 1))
    rec_B = g_ab(fake_A, post_z)
    cyc_A = l1(rec_A, A)
    cyc_B = l1(rec_B, B)
    cyc_z = l1(mu2, z.flatten(1))
    lg = (lg_a + lg_b + lg_z + lambda_A * cyc_A + lambda_B * cyc_B
          + lambda_z_B * cyc_z)
    opt_g.zero_grad()
    lg.backward()
    for m in (g_ab, g_ba, enc):
        torch.nn.utils.clip_grad_norm_(m.parameters(), max_gnorm)
    opt_g.step()
    vals = dict(D_A=loss_d_a, D_B=loss_d_b, D_z_B=loss_d_z, G_A=lg_a,
                G_B=lg_b, G_z_B=lg_z, Cyc_A=cyc_A, Cyc_B=cyc_B, Cyc_z_B=cyc_z)
    return {k: float(v.detach()) for k, v in vals.items()}


def train_step_stoch(nets, opt_g, opt_d, A, B, z, lambda_A=1.0,
                     lambda_B=1.0, max_gnorm=500.0):
    """One two-phase StochCycleGAN step (reference model.py:126-208):
    same structure as the aug step minus the encoder / latent terms.
    The cycle_gan variant is this step with the caller passing z == 1
    (reference model.py:128-129 ignore_noise)."""
    g_ab, g_ba = nets["g_ab"], nets["g_ba"]
    d_a, d_b = nets["d_a"], nets["d_b"]
    mse, l1 = F.mse_loss, F.l1_loss

    fake_B = g_ab(A, z)
    fake_A = g_ba(B)

    # D phase (detached fakes)
    pa_f = d_a(fake_A.detach())
    pa_t = d_a(A)
    loss_d_a = 0.5 * (mse(pa_f, torch.zeros_like(pa_f))
                      + mse(pa_t, torch.ones_like(pa_t)))
    pb_f = d_b(fake_B.detach())
    pb_t = d_b(B)
    loss_d_b = 0.5 * (mse(pb_f, torch.zeros_like(pb_f))
                      + mse(pb_t, torch.ones_like(pb_t)))
    opt_d.zero_grad()
    (loss_d_a + loss_d_b).backward()
    for m in (d_a, d_b):
        torch.nn.utils.clip_grad_norm_(m.parameters(), max_gnorm)
    opt_d.step()

    # G phase (vs updated D; rec_B reuses the SAME prior z,
    # reference model.py:176-179)
    pa = d_a(fake_A)
    lg_a = mse(pa, torch.ones_like(pa))
    pb = d_b(fake_B)
    lg_b = mse(pb, torch.ones_like(pb))
    rec_A = g_ba(fake_B)
    rec_B = g_ab(fake_A, z)
    cyc_A = l1(rec_A, A)
    cyc_B = l1(rec_B, B)
    lg = lg_a + lg_b + lambda_A * cyc_A + lambda_B * cyc_B
    opt_g.zero_grad()
    lg.backward()
    for m in (g_ab, g_ba):
        torch.nn.utils.clip_grad_norm_(m.parameters(), max_gnorm)
    opt_g.step()
    vals = dict(D_A=loss_d_a, D_B=loss_d_b, G_A=lg_a, G_B=lg_b,
                Cyc_A=cyc_A, Cyc_B=cyc_B)
    return {k: float(v.detach()) for k, v in vals.items()}


def measure_torch_proxy(batch=32, size=64, steps=10, warmup=2, zdim=16):
    nets = build_nets(zdim)
    opt_g, opt_d = make_optimizers(nets)

    A = torch.rand(batch, 3, size, size) * 2 - 1
    B = torch.rand(batch, 3, size, size) * 2 - 1

    def one_step():
        z = torch.randn(batch, zdim, 1, 1)
        train_step(nets, opt_g, opt_d, A, B, z)

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return {
        "images_per_sec": steps * batch / dt,
        "step_ms": 1e3 * dt / steps,
        "backend": "torch-cpu-proxy",
        "torch_version": torch.__version__,
        "note": "PyTorch reference-architecture proxy measured on CPU "
                "(no CUDA GPU in this environment)",
    }


if __name__ == "__main__":
    import json
    print(json.dumps(measure_torch_proxy(), indent=2))
