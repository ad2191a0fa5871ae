"""Downstream classifier harness: does synthetic data improve per-user
identification accuracy? (The project's real acceptance metric.)

Behavior targets:
- /root/reference/classifier_experiment_example.py:38-359 — ResNet18 from
  scratch, 15 epochs Adam 1e-4 batch 64, real-train ± synthetic
  augmentation, evaluation with per-class accuracy + confidence-distribution
  overfit heuristics.
- /root/reference/classifier_multi_seed_experiment.py:171-400 — repeats over
  seeds {6, 42, 888} aggregating mean/std/min/max to JSON.

TPU-native: one jitted train step with in-step BatchNorm stats; the epochs
loop and aggregation stay on the host.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import BatchLoader
from ..models.resnet import ResNet18

__all__ = ["ClassifierExperiment", "run_multi_seed"]

DEFAULT_SEEDS = (6, 42, 888)


class ClassifierExperiment:
    def __init__(self, num_classes: int = 31, lr: float = 1e-4,
                 epochs: int = 15, batch_size: int = 64, seed: int = 42,
                 image_size: int = 256):
        self.num_classes = num_classes
        self.lr = lr
        self.epochs = epochs
        self.batch_size = batch_size
        self.seed = seed
        self.image_size = image_size

        self.model = ResNet18(num_classes)
        x0 = jnp.zeros((2, image_size, image_size, 3))
        variables = self.model.init(jax.random.PRNGKey(seed), x0, train=False)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)

        model = self.model

        @jax.jit
        def train_step(params, batch_stats, opt_state, images, labels):
            def loss_fn(p):
                logits, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats}, images,
                    train=True, mutable=["batch_stats"])
                loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels))
                acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(
                    jnp.float32))
                return loss, (updates["batch_stats"], acc)

            (loss, (new_stats, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats, new_opt,
                    loss, acc)

        @jax.jit
        def eval_step(params, batch_stats, images):
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False)
            return jax.nn.softmax(logits, axis=-1)

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------

    def train(self, dataset, log_every: int = 20, verbose: bool = True):
        loader = BatchLoader(dataset, self.batch_size, shuffle=True,
                             seed=self.seed, drop_last=True)
        step = 0
        for epoch in range(self.epochs):
            t0 = time.time()
            losses, accs = [], []
            for images, labels in loader:
                (self.params, self.batch_stats, self.opt_state, loss,
                 acc) = self._train_step(
                    self.params, self.batch_stats, self.opt_state,
                    jnp.asarray(images), jnp.asarray(labels))
                losses.append(float(loss))
                accs.append(float(acc))
                step += 1
            if verbose:
                print(f"epoch {epoch + 1}/{self.epochs}: "
                      f"loss={np.mean(losses):.4f} acc={np.mean(accs):.3f} "
                      f"({time.time() - t0:.1f}s)")
        return self

    def evaluate(self, dataset) -> Dict:
        """Accuracy + per-class accuracy + confidence heuristics
        (reference classifier_experiment_example.py:245-297)."""
        loader = BatchLoader(dataset, self.batch_size, shuffle=False,
                             drop_last=False)
        all_preds, all_labels, all_conf = [], [], []
        for images, labels in loader:
            probs = np.asarray(self._eval_step(
                self.params, self.batch_stats, jnp.asarray(images)))
            all_preds.append(probs.argmax(-1))
            all_conf.append(probs.max(-1))
            all_labels.append(labels)
        preds = np.concatenate(all_preds)
        labels = np.concatenate(all_labels)
        conf = np.concatenate(all_conf)

        acc = float((preds == labels).mean())
        per_class = {}
        for c in np.unique(labels):
            mask = labels == c
            per_class[int(c)] = float((preds[mask] == labels[mask]).mean())

        warnings = []
        mean_conf = float(conf.mean())
        if mean_conf > 0.99:
            warnings.append(
                f"mean confidence {mean_conf:.3f} suspiciously high — "
                f"possible overfit")
        high_conf_wrong = float(conf[preds != labels].mean()) \
            if (preds != labels).any() else 0.0
        if high_conf_wrong > 0.9:
            warnings.append(
                f"wrong predictions still confident ({high_conf_wrong:.3f})")

        return {
            "accuracy": acc,
            "per_class_accuracy": per_class,
            "mean_confidence": mean_conf,
            "n_samples": int(len(labels)),
            "warnings": warnings,
        }


def run_multi_seed(
    make_train_dataset,
    make_test_dataset,
    seeds: Sequence[int] = DEFAULT_SEEDS,
    output_path: Optional[str] = None,
    **experiment_kwargs,
) -> Dict:
    """Repeat the experiment per seed; aggregate mean/std/min/max
    (reference classifier_multi_seed_experiment.py:300-400)."""
    results = []
    for seed in seeds:
        print(f"--- seed {seed} ---")
        exp = ClassifierExperiment(seed=seed, **experiment_kwargs)
        exp.train(make_train_dataset())
        res = exp.evaluate(make_test_dataset())
        res["seed"] = seed
        results.append(res)
        print(f"seed {seed}: accuracy {res['accuracy']:.4f}")

    accs = np.array([r["accuracy"] for r in results])
    summary = {
        "seeds": list(seeds),
        "accuracies": accs.tolist(),
        "mean": float(accs.mean()),
        "std": float(accs.std()),
        "min": float(accs.min()),
        "max": float(accs.max()),
        "per_seed": results,
    }
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        Path(output_path).write_text(json.dumps(summary, indent=2))
    print(f"multi-seed accuracy: {summary['mean']:.4f} ± {summary['std']:.4f} "
          f"(min {summary['min']:.4f}, max {summary['max']:.4f})")
    return summary
