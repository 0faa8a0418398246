"""Device meshes and sharded codec steps.

Batched decode/encode over a Mesh: the group axis is the natural data
shard (each 256x256 group's compute is independent — the exact property
libjxl exploits with threads, SURVEY.md §5.7). A second mesh axis
shards the pixel rows of each group for sequence-parallel style scaling
on giant images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libjxl_tpu.ops.decode_tpu import decode_groups_dct8, xyb_to_srgb8
from libjxl_tpu.ops.encode_tpu import (
    encode_groups_dct8, roundtrip_metrics, srgb_to_xyb,
)


def decode_mesh(devices=None, group_axis: int | None = None) -> Mesh:
    """1D mesh over the group axis (embarrassingly parallel decode)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    return Mesh(np.array(devices).reshape(n), ("groups",))


def codec_mesh(devices=None, batch: int | None = None) -> Mesh:
    """2D mesh: batch (images) x groups."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    b = batch or (2 if n % 2 == 0 and n > 1 else 1)
    return Mesh(np.array(devices).reshape(b, n // b), ("batch", "groups"))


def shard_groups(mesh: Mesh, arrays: tuple) -> tuple:
    """Place group-major arrays with the leading axis over 'groups'."""
    out = []
    for a in arrays:
        a = jnp.asarray(a)
        if a.ndim >= 1 and a.shape and a.shape[0] % mesh.shape["groups"] == 0:
            spec = P("groups")
        else:
            spec = P()
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def sharded_decode_step(mesh: Mesh):
    """jit-compiled batched group decode with the group axis sharded."""
    gspec = NamedSharding(mesh, P("groups"))
    rspec = NamedSharding(mesh, P())

    @jax.jit
    def step(coeffs, dc, raw_quant, table, inv_global_scale, ytox, ytob,
             qm_mul, biases):
        xyb = decode_groups_dct8(coeffs, dc, raw_quant, table,
                                 inv_global_scale, ytox, ytob, qm_mul,
                                 biases)
        return xyb_to_srgb8(xyb)

    return step, gspec, rspec


def sharded_codec_step(mesh: Mesh):
    """Full encode->decode->metric step over a ('batch','groups') mesh.

    The codec's "training step" analogue: forward (encode) + backward
    (decode reconstruction) + loss (PSNR), all device-side. Images
    shard over 'batch', group tiles over 'groups'.
    """

    @jax.jit
    def step(srgb_tiles, raw_quant, table, inv_table, inv_global_scale,
             ytox, ytob, qm_mul, mul_dc, biases):
        # srgb_tiles: (B, G, 3, H, W) in [0,1]
        xyb = jax.vmap(srgb_to_xyb)(srgb_tiles)
        q, qdc = jax.vmap(
            lambda t, rq: encode_groups_dct8(
                t, rq, table, inv_table, inv_global_scale, ytox[0], ytob[0],
                qm_mul, mul_dc, biases))(xyb, raw_quant)
        # Dequantized DC for reconstruction (mirrors DequantDC w/ CfL).
        y_dec = qdc[:, :, 1].astype(jnp.float32) * mul_dc[1]
        dc_x = qdc[:, :, 0].astype(jnp.float32) * mul_dc[0]
        dc_y = y_dec
        dc_b = qdc[:, :, 2].astype(jnp.float32) * mul_dc[2] + y_dec
        dc = jnp.stack([dc_x, dc_y, dc_b], axis=2)
        dec = jax.vmap(
            lambda qq, dd, rq: decode_groups_dct8(
                qq, dd, rq, table, inv_global_scale, ytox[0], ytob[0],
                qm_mul, biases))(q, dc, raw_quant)
        psnr = roundtrip_metrics(xyb, dec)
        return dec, psnr

    def place(args):
        specs = [P("batch", "groups"), P("batch", "groups"), P(), P(), P(),
                 P("groups"), P("groups"), P(), P(), P()]
        return tuple(jax.device_put(jnp.asarray(a), NamedSharding(mesh, s))
                     for a, s in zip(args, specs))

    return step, place


def example_codec_inputs(batch: int, groups: int, tile: int = 64,
                         seed: int = 0):
    rng = np.random.default_rng(seed)
    b, g = batch, groups
    blocks = tile // 8
    srgb = rng.random((b, g, 3, tile, tile), np.float32)
    raw_quant = np.full((b, g, blocks, blocks), 100, np.int32)
    from libjxl_tpu.vardct.quant_weights import DequantMatrices
    from libjxl_tpu.color.constants import DEFAULT_QUANT_BIAS
    table = DequantMatrices().table(0).reshape(3, 64)
    inv_table = (1.0 / table).astype(np.float32)
    inv_global_scale = np.float32(32.0)
    ytox = np.zeros((g, blocks, blocks), np.float32)
    ytob = np.ones((g, blocks, blocks), np.float32)
    qm_mul = np.array([1.25, 1.0, 1.0], np.float32)
    mul_dc = np.array([0.0008, 0.006, 0.013], np.float32)
    return (srgb, raw_quant, table, inv_table, inv_global_scale, ytox,
            ytob, qm_mul, mul_dc, DEFAULT_QUANT_BIAS)
