"""Intron-length-distribution fitting (fitild.cc / ildpdf.cc role).

Fits an observed intron-length sample to a 1-3 component Frechet mixture
by maximum likelihood (the reference uses GSL BFGS, ildpdf.h:45-120; here
optax Adam on the negative log-likelihood with softmax weights and
softplus-positive scale/shape — same model, TPU-native optimizer).

The fitted parameters feed IntronPenalty's ``-yI`` line
(score/intron.py IldParams): components (a_i, m_i, t_i, k_i) with
Frechet(x; m, t, k) = (k/t) z^(-1-k) exp(-z^-k), z = (x - m)/t.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class IldFit:
    weights: list[float]          # a_i, sum = 1
    mus: list[float]              # location m_i
    thetas: list[float]           # scale t_i
    kappas: list[float]           # shape k_i
    nll: float                    # per-sample negative log likelihood
    n: int

    def yI_line(self) -> str:
        """AlnParam ``-yI`` parameter string: llmt mode then per-component
        a, k, m, t (table/Dictyost/AlnParam layout)."""
        toks = []
        for a, k, m, t in zip(self.weights, self.kappas, self.mus,
                              self.thetas):
            toks += [f"{a:.4f}", f"{k:.4f}", f"{m:.2f}", f"{t:.2f}"]
        return " ".join(toks)


def frechet_logpdf(x, mu, th, kk):
    import jax.numpy as jnp
    z = jnp.maximum((x - mu) / th, 1e-9)
    return (jnp.log(kk / th) + (-1. - kk) * jnp.log(z) - z ** (-kk))


def fit_ild(lengths: np.ndarray, n_modes: int = 2, steps: int = 3000,
            lr: float = 0.02, seed: int = 0) -> IldFit:
    """Maximum-likelihood Frechet mixture over intron lengths."""
    import jax
    import jax.numpy as jnp
    import optax

    x = jnp.asarray(np.asarray(lengths, dtype=np.float64), jnp.float32)
    n = len(lengths)
    qs = np.quantile(lengths, np.linspace(0.25, 0.75, n_modes))
    minl = float(lengths.min())

    init = {
        "logit_w": jnp.zeros(n_modes),
        "mu_frac": jnp.full(n_modes, 0.5),          # mu = mu_frac * minl
        "log_th": jnp.log(jnp.asarray(qs, jnp.float32)),
        "log_kk": jnp.full(n_modes, np.log(1.5)),
    }

    def unpack(p):
        w = jax.nn.softmax(p["logit_w"])
        mu = jnp.clip(p["mu_frac"], 0., 0.98) * minl
        th = jnp.exp(p["log_th"])
        kk = jnp.clip(jnp.exp(p["log_kk"]), 0.05, 20.)
        return w, mu, th, kk

    def nll(p):
        w, mu, th, kk = unpack(p)
        lp = frechet_logpdf(x[:, None], mu[None, :], th[None, :],
                            kk[None, :])
        lw = jnp.log(w)[None, :]
        return -jnp.mean(jax.nn.logsumexp(lp + lw, axis=1))

    opt = optax.adam(lr)
    state = opt.init(init)
    p = init
    val_grad = jax.jit(jax.value_and_grad(nll))
    best, best_p = np.inf, p
    for i in range(steps):
        v, g = val_grad(p)
        if bool(jnp.isfinite(v)) and float(v) < best:
            best, best_p = float(v), p
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    wv, muv, thv, kkv = (np.asarray(t) for t in
                         (lambda q: (q[0], q[1], q[2], q[3]))(
                             _unpack_np(best_p, minl)))
    order = np.argsort(muv + thv)
    return IldFit(weights=[float(wv[i]) for i in order],
                  mus=[float(muv[i]) for i in order],
                  thetas=[float(thv[i]) for i in order],
                  kappas=[float(kkv[i]) for i in order],
                  nll=best, n=n)


def _unpack_np(p, minl):
    import jax
    import jax.numpy as jnp
    w = jax.nn.softmax(p["logit_w"])
    mu = jnp.clip(p["mu_frac"], 0., 0.98) * minl
    th = jnp.exp(p["log_th"])
    kk = jnp.clip(jnp.exp(p["log_kk"]), 0.05, 20.)
    return w, mu, th, kk


def sample_frechet_mixture(rng: np.random.Generator, n: int,
                           weights, mus, thetas, kappas) -> np.ndarray:
    """Draw intron lengths from a Frechet mixture (testing aid)."""
    comp = rng.choice(len(weights), size=n, p=np.asarray(weights))
    u = rng.uniform(1e-9, 1 - 1e-9, size=n)
    mus = np.asarray(mus)[comp]
    th = np.asarray(thetas)[comp]
    kk = np.asarray(kappas)[comp]
    return mus + th * (-np.log(u)) ** (-1. / kk)
