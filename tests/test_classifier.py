"""Classifier harness: ResNet18 learns a trivially separable 2-class
problem and the evaluation/multi-seed plumbing works."""

import numpy as np
import pytest

from vqgan_tpu.eval.classifier import ClassifierExperiment, run_multi_seed


class _ToyDataset:
    """Class 0 = dark images, class 1 = bright images."""

    def __init__(self, n=64, size=32, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            label = i % 2
            base = 0.2 if label == 0 else 0.8
            img = np.clip(
                rng.normal(base, 0.05, (size, size, 3)), 0, 1
            ).astype(np.float32)
            self.items.append((img, label))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_classifier_learns_separable_problem():
    exp = ClassifierExperiment(num_classes=2, lr=1e-3, epochs=10,
                               batch_size=16, image_size=32, seed=0)
    exp.train(_ToyDataset(n=128), verbose=False)
    res = exp.evaluate(_ToyDataset(n=32, seed=1))
    assert res["accuracy"] > 0.9
    assert set(res["per_class_accuracy"]) == {0, 1}
    assert res["n_samples"] == 32


def test_multi_seed_aggregation(tmp_path):
    out = tmp_path / "multi.json"
    summary = run_multi_seed(
        lambda: _ToyDataset(n=32),
        lambda: _ToyDataset(n=16, seed=2),
        seeds=(1, 2),
        output_path=str(out),
        num_classes=2, lr=1e-3, epochs=1, batch_size=16, image_size=32)
    assert out.exists()
    assert len(summary["accuracies"]) == 2
    assert 0.0 <= summary["mean"] <= 1.0
    assert summary["std"] >= 0.0
