"""Train state containers, optimizer construction and checkpointing
(reference: torch Adam + .pth checkpoints, train.py:154-174, 781-786,
1316-1320 — rebuilt on optax + orbax)."""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import Discriminator2D, Generator, GeneratorConfig
from .config import TrainConfig


@struct.dataclass
class GenState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # global iteration


@struct.dataclass
class DiscState:
    params: Any
    spectral_stats: Any
    opt_state: Any


def make_generator(cfg: TrainConfig) -> Generator:
    return Generator(
        GeneratorConfig(
            nf=cfg.nf_gen,
            nf_in_color=4 if cfg.input_mask else 3,
            pass_geo_feats=cfg.pass_geo_feats,
            truncation=cfg.truncation,
            input_mask=cfg.input_mask,
            dtype=cfg.compute_dtype,
            channels_first=cfg.channels_first,
            pallas_conv=cfg.pallas_conv,
            fused_conv=cfg.fused_conv,
            folded_conv=cfg.folded_conv,
            zslab_conv=cfg.zslab_conv,
            remat=cfg.remat,
        )
    )


def make_discriminator(cfg: TrainConfig) -> Discriminator2D:
    return Discriminator2D(
        nf_in=cfg.disc_nf_in,
        nf=cfg.nf_disc,
        patch_size=cfg.patch_size,
        image_dims=(cfg.style_height, cfg.style_width),
        patch=cfg.patch_disc,
        disc_loss_type=cfg.disc_loss_type,
    )


def gen_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # torch Adam defaults: b1=0.9 b2=0.999 eps=1e-8; weight_decay via
    # additive decay like torch (train.py:156)
    tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    if cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def disc_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.adam(cfg.d_lr_factor * cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    if cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def init_states(
    cfg: TrainConfig, rng: jax.Array, with_disc: Optional[bool] = None
) -> Tuple[GenState, Optional[DiscState]]:
    """Initialize generator (and discriminator) parameters/optimizers with
    dummy batches of the configured shapes."""
    if with_disc is None:
        with_disc = cfg.weight_disc_loss > 0
    gen = make_generator(cfg)
    z, y, x = cfg.input_dim
    dummy_x = jnp.zeros((1, z, y, x, 4), jnp.float32)
    dummy_m = jnp.zeros((1, z, y, x, 1), jnp.float32)
    rng, k1, k2 = jax.random.split(rng, 3)
    # jit the init: eager init would compile each op separately, which is
    # pathologically slow on remote-compile TPU backends
    init_fn = jax.jit(
        functools.partial(
            gen.init, pred_color=True, pred_sdf=True, pred_semantic=True, train=False
        )
    )
    variables = init_fn(k1, dummy_x, dummy_m)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    gs = GenState(
        params=params,
        batch_stats=batch_stats,
        opt_state=gen_optimizer(cfg).init(params),
        step=jnp.zeros((), jnp.int32),
    )
    ds = None
    if with_disc:
        disc = make_discriminator(cfg)
        dummy_img = jnp.zeros((1, cfg.style_height, cfg.style_width, cfg.disc_nf_in), jnp.float32)
        dvars = jax.jit(functools.partial(disc.init, update_sn_stats=False))(k2, dummy_img)
        ds = DiscState(
            params=dvars["params"],
            spectral_stats=dvars.get("spectral_stats", {}),
            opt_state=disc_optimizer(cfg).init(dvars["params"]),
        )
    return gs, ds


# ---------------------------------------------------------------------------
# checkpointing (orbax; mirrors reference retrain/--start_epoch semantics)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, gen_state: GenState, disc_state: Optional[DiscState], epoch: int):
    """Write an orbax checkpoint.

    Multi-host: orbax saves are collective (every process must call save —
    it syncs all hosts and the primary writes the replicated arrays), so the
    training loop calls this on ALL processes and passes the live sharded
    arrays through; single-process keeps the device_get-to-numpy path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    prep = (lambda t: t) if jax.process_count() > 1 else jax.device_get
    ckpt = {"gen": prep(gen_state), "epoch": epoch}
    if disc_state is not None:
        ckpt["disc"] = prep(disc_state)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def load_any_checkpoint(path: str, gen_state: GenState, disc_state: Optional[DiscState]):
    """Load either an orbax checkpoint directory or a reference PyTorch
    ``.pth`` checkpoint (converted on the fly). Returns
    (gen_state, disc_state, epoch)."""
    if path.endswith(".pth"):
        from ..models.convert import load_reference_checkpoint

        variables, epoch = load_reference_checkpoint(path)
        if "spectral_stats" in variables:
            # discriminator .pth (reference train.py:171-178 retrain_disc)
            if disc_state is None:
                raise ValueError(
                    f"{path!r} is a discriminator checkpoint but no "
                    "discriminator is configured (weight_disc_loss == 0)"
                )
            asarr = functools.partial(jax.tree_util.tree_map, jnp.asarray)
            # keep template stats for any conv whose power-iteration vectors
            # were absent from the .pth; converted entries override
            stats = dict(disc_state.spectral_stats)
            stats.update(asarr(variables["spectral_stats"]))
            disc_state = disc_state.replace(
                params=asarr(variables["params"]), spectral_stats=stats
            )
            return gen_state, disc_state, epoch
        gen_state = gen_state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, variables["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"]),
        )
        # epoch restored from the .pth (reference train.py:165-170); torch
        # Adam moments are not converted — optimizer starts fresh.
        return gen_state, disc_state, epoch
    return load_checkpoint(path, gen_state, disc_state)


def load_checkpoint(path: str, gen_state: GenState, disc_state: Optional[DiscState]):
    """Restore into existing state structures. Returns
    (gen_state, disc_state, epoch)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = {"gen": gen_state, "epoch": 0}
    if disc_state is not None:
        template["disc"] = disc_state
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    return restored["gen"], restored.get("disc"), int(restored["epoch"])
