"""The neural polisher must beat plain majority on noisy pileups."""

import numpy as np
import pytest

from hairsplitter_tpu.models import polisher as P

pytestmark = pytest.mark.skipif(not P.HAVE_FLAX, reason="flax unavailable")


def _accuracy(pred, labels):
    return float((pred == labels).mean())


def test_nn_polisher_beats_majority(rng):
    # at LOW coverage plain majority breaks; the net can use the backbone
    # prior and neighborhood context (medaka's reason to exist)
    nn = P.train_polisher(seed=0, steps=200, batch=8, L=256)
    np_rng = np.random.default_rng(42)
    n_maj = n_nn = n_tot = 0
    for _ in range(15):
        feats, labels = P._simulate_training_batch(
            np_rng, L=256, cov_lo=3, cov_hi=6, err=0.2, div=0.01
        )
        counts = feats[:, :5]
        maj = counts.argmax(axis=1)
        pred = nn.logits(feats).argmax(axis=1)
        n_maj += int((maj == labels).sum())
        n_nn += int((pred == labels).sum())
        n_tot += labels.size
    acc_maj = n_maj / n_tot
    acc_nn = n_nn / n_tot
    assert acc_nn > acc_maj, (acc_nn, acc_maj)
    assert acc_nn > 0.95, acc_nn


def test_nn_polisher_corrects_backbone_divergence(rng):
    nn = P.train_polisher(seed=1, steps=120, batch=8, L=256)
    np_rng = np.random.default_rng(7)
    feats, labels = P._simulate_training_batch(np_rng, L=256, err=0.1, div=0.05)
    backbone = feats[:, 7:].argmax(axis=1)
    pred = nn.logits(feats).argmax(axis=1)
    diverged = backbone != labels
    assert diverged.sum() > 3
    # at diverged positions the net must follow the reads, not the backbone
    acc_at_div = float((pred[diverged] == labels[diverged]).mean())
    assert acc_at_div > 0.8, acc_at_div
