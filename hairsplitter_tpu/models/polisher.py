"""Neural consensus polisher (the medaka-equivalent, TPU-native).

The reference optionally polishes with medaka, a neural network over read
pileups (`hairsplitter.py -p medaka`, `src/tools.cpp:594-689` drives it as a
subprocess). Here the equivalent is a small flax CNN over pileup count
features, trained with optax on simulated data — fully in-process, jittable,
and TPU-friendly (1-D convolutions over the position axis).

Features per contig position (from the same pileup tensors as stage 3):
    counts of A/C/G/T/- among covering reads (normalized), coverage,
    insertion-event rate, one-hot of the backbone base.
Labels: the true base at that position (A/C/G/T or deletion).

`train_polisher` trains on synthetic (backbone, reads) pairs where the
backbone diverges from the truth by substitutions and the reads carry
sequencing errors — the net learns both error suppression and divergence
correction. `NNPolisher.polish_counts` applies it per position; insertion
recovery stays rule-based (ops/consensus.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    import optax

    HAVE_FLAX = True
except Exception:  # pragma: no cover
    HAVE_FLAX = False

N_CLASSES = 5  # A C G T -
N_FEATURES = 12  # 5 counts + coverage + ins rate + 5 backbone one-hot


if HAVE_FLAX:

    class PolisherCNN(nn.Module):
        """1-D CNN over positions: [B, L, F] -> [B, L, 5] base logits."""

        width: int = 48

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.width, kernel_size=(9,))(x)
            x = nn.relu(x)
            x = nn.Conv(self.width, kernel_size=(9,))(x)
            x = nn.relu(x)
            x = nn.Conv(self.width, kernel_size=(5,))(x)
            x = nn.relu(x)
            return nn.Dense(N_CLASSES)(x)


def pileup_features(counts: np.ndarray, ins_rate: np.ndarray, backbone: np.ndarray) -> np.ndarray:
    """Per-position feature vectors. counts: [L, 5] base counts,
    ins_rate: [L], backbone: [L] base codes."""
    cov = counts.sum(axis=1, keepdims=True)
    norm = counts / np.maximum(cov, 1)
    onehot = np.eye(5, dtype=np.float32)[np.clip(backbone, 0, 4)]
    feats = np.concatenate(
        [
            norm.astype(np.float32),
            (cov / 50.0).astype(np.float32),
            ins_rate[:, None].astype(np.float32),
            onehot,
        ],
        axis=1,
    )
    return feats


def _simulate_training_batch(rng, L=512, cov_lo=3, cov_hi=25, err=0.1, div=0.01):
    """(features [L, F], labels [L]) from one synthetic backbone/truth pair."""
    truth = rng.integers(0, 4, L).astype(np.int8)
    backbone = truth.copy()
    # backbone diverges from the truth by substitutions
    nmut = max(1, int(L * div))
    mut = rng.choice(L, nmut, replace=False)
    backbone[mut] = (backbone[mut] + rng.integers(1, 4, nmut)) % 4
    # truth also contains deletions relative to the backbone: mark label '-'
    ndel = max(1, int(L * div * 0.3))
    dels = rng.choice(L, ndel, replace=False)
    labels = truth.astype(np.int64)
    labels[dels] = 4
    cov = int(rng.integers(cov_lo, cov_hi))
    counts = np.zeros((L, 5), dtype=np.float32)
    ins_rate = np.zeros(L, dtype=np.float32)
    for _ in range(cov):
        read = labels.copy()  # reads carry the truth (incl. deletions)
        e = rng.random(L) < err
        sub = e & (rng.random(L) < 0.5)
        read[sub] = (read[sub] + rng.integers(1, 4, int(sub.sum()))) % 4
        gap = e & ~sub
        read[gap] = 4
        present = rng.random(L) < 0.97
        for b in range(5):
            counts[:, b] += (read == b) & present
        ins_rate += (rng.random(L) < err * 0.2) & present
    ins_rate /= max(1, cov)
    feats = pileup_features(counts, ins_rate, backbone)
    return feats, labels


@dataclass
class NNPolisher:
    params: dict
    model: "PolisherCNN"

    def logits(self, feats: np.ndarray) -> np.ndarray:
        out = self.model.apply(self.params, jnp.asarray(feats)[None])
        return np.asarray(out)[0]

    def polish_counts(self, counts: np.ndarray, ins_rate: np.ndarray, backbone: np.ndarray) -> np.ndarray:
        """Predicted base codes per position (4 = deletion)."""
        from ..utils.shapes import pad_axis, pow2_bucket

        L = counts.shape[0]
        Lb = pow2_bucket(L, minimum=256)  # one compile per length bucket
        feats = pileup_features(
            pad_axis(counts, 0, Lb, 0),
            pad_axis(ins_rate, 0, Lb, 0.0),
            pad_axis(backbone, 0, Lb, 0),
        )
        return self.logits(feats).argmax(axis=1).astype(np.int8)[:L]


def train_polisher(
    seed: int = 0, steps: int = 300, batch: int = 8, L: int = 512, lr: float = 1e-3
) -> NNPolisher:
    """Train the polisher on synthetic data (seconds on CPU, faster on TPU)."""
    assert HAVE_FLAX, "flax/optax unavailable"
    rng = np.random.default_rng(seed)
    model = PolisherCNN()
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, L, N_FEATURES)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(steps):
        xs, ys = [], []
        for _ in range(batch):
            f, l = _simulate_training_batch(rng, L=L)
            xs.append(f)
            ys.append(l)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))
        )
    return NNPolisher(params=params, model=model)


_DEFAULT: NNPolisher | None = None


def default_polisher() -> NNPolisher:
    """Process-wide polisher, trained once on synthetic data at first use
    (the reference downloads medaka's pretrained weights; here training is
    seconds and fully reproducible — seed 0)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = train_polisher(seed=0)
    return _DEFAULT
