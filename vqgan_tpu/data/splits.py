"""Dataset split creation, verification, and loading.

Behavior targets:
- /root/reference/vqgan_ldm_baseline/create_data_split.py:18-221 — stratified
  UNIFORM temporal sampling: per user, `np.linspace(0, N-1, n_train)` frame
  indices (dedup + top-up), writing `data_split.json` with per-user
  train/test indices and paths, plus `verify_split` integrity checks.
- /root/reference/preprocess_latents.py:126-193 — the same uniform scheme on
  the LDM side.

On-disk schema (kept compatible so reference tooling can read our splits):
{
  "metadata": {...},
  "users": {
    "ID_1": {"train_indices": [...], "train_images": [...],
             "test_indices": [...], "test_images": [...],
             (optional GMM fields: "gen_train_images", "class_train_images",
              "cluster_labels")},
    ...
  }
}
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

__all__ = [
    "uniform_indices",
    "create_data_split",
    "verify_split",
    "load_split",
    "user_dirs",
    "IMAGE_EXTENSIONS",
]

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


def user_dirs(data_path: str | Path, num_users: int = 31) -> Dict[str, Path]:
    """ID_1..ID_{num_users} folders under the dataset root."""
    root = Path(data_path)
    return {f"ID_{i}": root / f"ID_{i}" for i in range(1, num_users + 1)}


def _list_images(user_dir: Path) -> List[Path]:
    files = [p for p in sorted(user_dir.iterdir())
             if p.suffix.lower() in IMAGE_EXTENSIONS]
    return files


def uniform_indices(n_total: int, n_pick: int) -> np.ndarray:
    """Stratified uniform temporal sampling: linspace indices, dedup, top-up
    from the unused pool (reference create_data_split.py:45-70)."""
    if n_pick >= n_total:
        return np.arange(n_total)
    idx = np.unique(np.linspace(0, n_total - 1, n_pick).astype(int))
    if len(idx) < n_pick:
        unused = np.setdiff1d(np.arange(n_total), idx)
        top_up = unused[: n_pick - len(idx)]
        idx = np.sort(np.concatenate([idx, top_up]))
    return idx


def create_data_split(
    data_path: str | Path,
    num_users: int = 31,
    images_per_user_train: int = 50,
    seed: int = 42,
) -> Dict:
    """Build the uniform-sampling split structure (not yet GMM-stratified)."""
    split = {
        "metadata": {
            "method": "stratified_uniform",
            "num_users": num_users,
            "images_per_user_train": images_per_user_train,
            "seed": seed,
            "data_path": str(data_path),
        },
        "users": {},
    }
    for user, d in user_dirs(data_path, num_users).items():
        if not d.is_dir():
            print(f"warning: missing user directory {d}, skipping")
            continue
        files = _list_images(d)
        n = len(files)
        train_idx = uniform_indices(n, images_per_user_train)
        test_idx = np.setdiff1d(np.arange(n), train_idx)
        split["users"][user] = {
            "total_images": n,
            "train_indices": train_idx.tolist(),
            "train_images": [files[i].name for i in train_idx],
            "test_indices": test_idx.tolist(),
            "test_images": [files[i].name for i in test_idx],
        }
    return split


def verify_split(split: Dict) -> List[str]:
    """Integrity invariants (reference create_data_split.py:130-182):
    train/test disjoint per user, no duplicates, counts consistent.
    Returns a list of problem strings (empty = OK)."""
    problems = []
    for user, info in split["users"].items():
        train = info["train_images"]
        test = info["test_images"]
        if len(set(train)) != len(train):
            problems.append(f"{user}: duplicate train images")
        if len(set(test)) != len(test):
            problems.append(f"{user}: duplicate test images")
        overlap = set(train) & set(test)
        if overlap:
            problems.append(f"{user}: train/test overlap {sorted(overlap)[:3]}")
        if "total_images" in info:
            if len(train) + len(test) != info["total_images"]:
                problems.append(
                    f"{user}: train+test != total "
                    f"({len(train)}+{len(test)} != {info['total_images']})")
        for key in ("gen_train_images", "class_train_images"):
            if key in info:
                extra = info[key]
                if len(set(extra)) != len(extra):
                    problems.append(f"{user}: duplicates in {key}")
                if set(extra) & set(test):
                    problems.append(f"{user}: {key} overlaps test")
        if "gen_train_images" in info and "class_train_images" in info:
            if set(info["gen_train_images"]) & set(info["class_train_images"]):
                problems.append(f"{user}: gen/class train overlap")
    return problems


def save_split(split: Dict, path: str | Path):
    Path(path).write_text(json.dumps(split, indent=2))


def load_split(path: str | Path) -> Dict:
    return json.loads(Path(path).read_text())


def train_images_for_user(split: Dict, user: str) -> List[str]:
    """Preference order matching the reference LatentDataset
    (train_latent_cfg.py:260-303): gen_train_images (GMM) →
    train_images (uniform)."""
    info = split["users"][user]
    if "gen_train_images" in info:
        return info["gen_train_images"]
    return info["train_images"]
