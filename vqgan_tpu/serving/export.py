"""Ahead-of-time serving artifacts via jax.export (StableHLO).

The reference serves by loading a torch checkpoint and re-running Python
model code (generate.py:45-139). A TPU-native production deployment wants
an artifact that is independent of the model-building Python: this module
exports any jitted program — in particular the full CFG sampling pipeline
(DDIM scan + VAE decode, the generate.py hot path) — as a serialized
StableHLO module with its parameters, reloadable and executable with no
vqgan_tpu model code on the serving host.

Artifact layout (a directory):
    program.bin    serialized jax.export.Exported (StableHLO + calling conv)
    params.npz     flattened parameter arrays
    meta.json      treedef + arg structure + export platforms + config

Exported modules are platform-checked at call time (export for "tpu" to
serve on TPU; "cpu" artifacts serve anywhere jax runs). The serialization
format carries jax.export's compatibility guarantees for StableHLO.

Example:
    fn = lambda params, key, classes: diffusion.sample(params, key,
                                                       classes=classes)
    export_cfg_sampler(fn, params, example_args, outdir)
    ...
    sampler = load_cfg_sampler(outdir)       # no model code needed
    images = sampler(key, classes)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax import export as jax_export

__all__ = [
    "export_program",
    "load_program",
    "export_cfg_sampler",
    "load_cfg_sampler",
    "export_vq_codec",
    "load_vq_codec",
]


def _specs(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tree)


def export_program(fn: Callable, example_args: Sequence[Any], path,
                   platforms: Sequence[str] | None = None,
                   in_shardings=None) -> None:
    """Serialize jit(fn) lowered at example_args' shapes to `path` (a file).

    platforms: lowering platforms recorded in the artifact (default: the
    current default backend). An artifact exported for ["tpu"] can only be
    called on TPU; export for ["cpu", "tpu"] to get a portable module at
    the cost of lowering twice.

    in_shardings: optional jit in_shardings (NamedShardings over a Mesh)
    for a multi-device program — the artifact then records the mesh size
    and per-argument shardings in its calling convention.
    """
    jitted = (jax.jit(fn) if in_shardings is None
              else jax.jit(fn, in_shardings=in_shardings))
    exp = jax_export.export(
        jitted,
        platforms=list(platforms) if platforms else None,
    )(*_specs(tuple(example_args)))
    Path(path).write_bytes(exp.serialize())


def _load_exported(path, mesh=None):
    """(exp, mesh_or_None, jitted call) for an exported program file."""
    exp = jax_export.deserialize(Path(path).read_bytes())
    if exp.nr_devices == 1:
        return exp, None, jax.jit(exp.call)
    if mesh is None:
        mesh = _default_mesh_like(exp)
    # in/out_shardings_jax are FLAT (one per leaf); jit wants them shaped
    # like the calling convention — unflatten with the recorded trees
    args_sh, kwargs_sh = jax.tree.unflatten(
        exp.in_tree, list(exp.in_shardings_jax(mesh)))
    assert not kwargs_sh, "exported programs are positional-only"
    outs_sh = jax.tree.unflatten(
        exp.out_tree, list(exp.out_shardings_jax(mesh)))
    return exp, mesh, jax.jit(exp.call, in_shardings=args_sh,
                              out_shardings=outs_sh)


def load_program(path, mesh=None) -> Callable:
    """Deserialize an exported program; returns a callable running it via
    the current backend (jax.jit over Exported.call keeps dispatch fast).

    A program exported over an N-device mesh must be called over N devices
    again: pass a Mesh with the same axis names/shape (any N devices), or
    let the default build one from the first N of jax.devices()."""
    return _load_exported(path, mesh)[2]


def _default_mesh_like(exp):
    """A Mesh over the first nr_devices local devices with the exported
    mesh's axis names/shape (kept as an AbstractMesh on the deserialized
    calling-convention NamedShardings)."""
    from jax.sharding import Mesh, NamedSharding

    devs = jax.devices()
    if len(devs) < exp.nr_devices:
        raise ValueError(f"program exported for {exp.nr_devices} devices; "
                         f"only {len(devs)} available")
    shape, axes = (exp.nr_devices,), ("data",)  # fallback: one flat axis
    named = getattr(exp, "_in_named_shardings", None) or ()
    for s in named:
        if isinstance(s, NamedSharding):
            shape = tuple(s.mesh.shape.values())
            axes = tuple(s.mesh.axis_names)
            break
    return Mesh(np.array(devs[:exp.nr_devices]).reshape(shape), axes)


# --------------------------------------------------------------------------
# the generate.py serving surface: params baked into the artifact directory


def export_cfg_sampler(fn: Callable, params: Any,
                       example_args: Sequence[Any], outdir,
                       platforms: Sequence[str] | None = None,
                       config: dict | None = None,
                       mesh=None, arg_specs=None, param_specs=None) -> None:
    """Export `fn(params, *example_args)` plus its params as a
    self-contained serving directory.

    fn's first argument must be the param pytree; the remaining arguments
    (e.g. PRNG key, class labels) stay call-time inputs.

    mesh + arg_specs make a MULTI-DEVICE artifact: the program is jitted
    over the Mesh with each call-time argument sharded per its
    PartitionSpec (e.g. P("data") on the class-label batch for
    data-parallel serving). param_specs (a PartitionSpec pytree matching
    `params`, e.g. from parallel.tp rules) additionally shards the model
    weights over the mesh — tensor-parallel serving for models bigger than
    one chip; default replicated. The artifact then requires the same
    number of devices (any devices, same axis layout) at load time — the
    TPU-pod serving story, with XLA inserting the collectives.
    """
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    leaves, treedef = jax.tree.flatten(params)
    param_dtypes = _save_params(outdir, leaves)

    def flat_fn(flat_params, *args):
        p = jax.tree.unflatten(treedef, list(flat_params))
        return fn(p, *args)

    in_shardings = None
    mesh_meta = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if arg_specs is None:
            arg_specs = tuple(PartitionSpec() for _ in example_args)
        repl = NamedSharding(mesh, PartitionSpec())
        if param_specs is None:
            flat_param_sh = tuple(repl for _ in leaves)
        else:
            spec_leaves = jax.tree.flatten(
                param_specs,
                is_leaf=lambda x: isinstance(x, PartitionSpec))[0]
            assert len(spec_leaves) == len(leaves), (
                f"param_specs has {len(spec_leaves)} leaves, params have "
                f"{len(leaves)}")
            flat_param_sh = tuple(
                NamedSharding(mesh, s) for s in spec_leaves)
        in_shardings = (flat_param_sh,) + tuple(
            NamedSharding(mesh, s) for s in arg_specs)
        mesh_meta = {"shape": list(mesh.devices.shape),
                     "axes": list(mesh.axis_names),
                     "nr_devices": int(mesh.devices.size)}

    export_program(flat_fn, (tuple(leaves),) + tuple(example_args),
                   outdir / "program.bin", platforms=platforms,
                   in_shardings=in_shardings)

    meta = {
        "treedef": str(treedef),
        "n_params": len(leaves),
        "param_dtypes": param_dtypes,
        "arg_shapes": [list(np.shape(a)) for a in example_args],
        "arg_dtypes": [str(np.asarray(a).dtype) for a in example_args],
        "platforms": list(platforms) if platforms else None,
        "mesh": mesh_meta,
        "config": config or {},
    }
    (outdir / "meta.json").write_text(json.dumps(meta, indent=1))


def _save_params(outdir, leaves) -> list:
    """params.npz + the per-leaf dtype tags. numpy serializes non-native
    dtypes (bfloat16, fp8) as raw void bytes; the tags let the loader
    re-view them."""
    np.savez(Path(outdir) / "params.npz",
             **{str(i): np.asarray(l) for i, l in enumerate(leaves)})
    return [str(getattr(l, "dtype", np.asarray(l).dtype)) for l in leaves]


def _restore_leaves(outdir) -> tuple:
    """Load params.npz, re-viewing any non-native dtypes via the meta tags
    (older artifacts without tags load as-is)."""
    outdir = Path(outdir)
    data = np.load(outdir / "params.npz")
    leaves = [data[str(i)] for i in range(len(data.files))]
    try:
        tags = json.loads(
            (outdir / "meta.json").read_text()).get("param_dtypes")
    except Exception:
        tags = None
    if tags:
        import ml_dtypes

        for i, (leaf, tag) in enumerate(zip(leaves, tags)):
            if leaf.dtype.kind == "V":  # raw bytes → re-view per tag
                leaves[i] = leaf.view(np.dtype(getattr(
                    ml_dtypes, tag, tag)))
    return tuple(leaves)


def load_cfg_sampler(outdir, mesh=None) -> Callable:
    """Load a serving directory; returns `call(*args)` with params bound.

    Needs only jax + numpy on the serving host — no vqgan_tpu model code.
    Multi-device artifacts build a default mesh over the first N local
    devices (or pass `mesh` explicitly)."""
    outdir = Path(outdir)
    leaves = _restore_leaves(outdir)
    exp, mesh, run = _load_exported(outdir / "program.bin", mesh=mesh)
    # place the weights ONCE at load (per their exported shardings on a
    # mesh) — numpy leaves would otherwise re-upload on every request
    if mesh is None:
        leaves = tuple(jax.device_put(l) for l in leaves)
    else:
        param_sh = exp.in_shardings_jax(mesh)[:len(leaves)]
        leaves = tuple(jax.device_put(l, s)
                       for l, s in zip(leaves, param_sh))

    def call(*args):
        return run(leaves, *args)

    return call


# --------------------------------------------------------------------------
# the VQ index codec: two programs (encode, decode) over one param set


def export_vq_codec(encode_fn: Callable, decode_fn: Callable, params: Any,
                    example_images, example_indices, outdir,
                    platforms: Sequence[str] | None = None,
                    config: dict | None = None) -> None:
    """Export the VQ-VAE index codec as a self-contained serving directory.

    The reference's compressed-storage surface (`encode_to_indices` /
    `decode_from_indices`, vq_vae.py:162,177) as deployable AOT artifacts:
    `encode.bin` maps images → int codebook indices, `decode.bin` maps
    indices → images, both closed over one shared `params.npz`. A host with
    jax + numpy can run compression and reconstruction with no model code.

    encode_fn(params, images) -> indices; decode_fn(params, indices) ->
    images, lowered at the example shapes.
    """
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    leaves, treedef = jax.tree.flatten(params)
    param_dtypes = _save_params(outdir, leaves)

    def flat_encode(flat_params, images):
        return encode_fn(jax.tree.unflatten(treedef, list(flat_params)),
                         images)

    def flat_decode(flat_params, indices):
        return decode_fn(jax.tree.unflatten(treedef, list(flat_params)),
                         indices)

    export_program(flat_encode, (tuple(leaves), example_images),
                   outdir / "encode.bin", platforms=platforms)
    export_program(flat_decode, (tuple(leaves), example_indices),
                   outdir / "decode.bin", platforms=platforms)

    meta = {
        "programs": ["encode", "decode"],
        "n_params": len(leaves),
        "param_dtypes": param_dtypes,
        "image_shape": list(np.shape(example_images)),
        "image_dtype": str(np.asarray(example_images).dtype),
        "index_shape": list(np.shape(example_indices)),
        "index_dtype": str(np.asarray(example_indices).dtype),
        "platforms": list(platforms) if platforms else None,
        "config": config or {},
    }
    (outdir / "meta.json").write_text(json.dumps(meta, indent=1))


def load_vq_codec(outdir) -> tuple[Callable, Callable]:
    """Load a codec directory; returns `(encode, decode)` with params bound.

    Needs only jax + numpy on the serving host — no vqgan_tpu model code.
    """
    outdir = Path(outdir)
    leaves = tuple(jax.device_put(l)
                   for l in _restore_leaves(outdir))  # upload weights once
    run_enc = load_program(outdir / "encode.bin")
    run_dec = load_program(outdir / "decode.bin")
    return (lambda images: run_enc(leaves, images),
            lambda indices: run_dec(leaves, indices))
