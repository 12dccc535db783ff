"""Prompt-axis model parallelism for the EPS decode engine.

SURVEY §2.5's "headline throughput lever" / BASELINE.json configs[4]
("images + prompt batches data-parallel over ICI"): each 32-prompt EPS
decode iteration (reference semantics `/root/reference/crowdsam/model.py:229-247`)
is sharded over the mesh 'model' axis — chip r decodes prompts
[r*K/M, (r+1)*K/M) of every batch, the occupancy bitmap is OR-reduced
collectively each iteration, and the post-loop NMS/compaction runs
replicated on all-gathered per-detection scalars with only the top
max_keep mask slabs crossing ICI (masked psum).  Semantics are exactly
the single-chip engine's (tests/test_prompt_shard.py pins equivalence on
the virtual device mesh).

Composes with data parallelism: on a (data, model) mesh, images shard
over 'data' (parallel/eval_shard.py) and each image's prompt batches over
'model' — the BASELINE.json configs[4] layout.

Cost model (why this is opt-in): the single-chip engine is ~53 ms of a
~300-600 ms image; M-way sharding bounds the win at ~40 ms/img (the
~7 ms while-loop fixed overhead and the replicated bookkeeping do not
shard) for 16 psums of a 256 KB occupancy vector + one ~max_keep-row
slab psum over ICI.  It is the right trade when single-image latency is
the product metric; throughput deployments should spend the same chips
on data parallelism instead.
"""

from __future__ import annotations

import jax

from crowdsam_tpu.pipeline.engine import make_eps_engine


def make_prompt_sharded_engine(model, mesh, axis: str = "model",
                               spec_allow_kernel: bool = True):
    """Build a drop-in replacement for `model.engine` that runs each
    prompt batch sharded over `mesh.shape[axis]` devices.

    All inputs are replicated (the image's features are small relative to
    the decode FLOPs); outputs are replicated, so the host tail
    (`CrowdSAM._finalize_crop`) is unchanged.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    m = int(mesh.shape[axis])
    k = model.engine_cfg.points_per_batch
    assert k % m == 0, (
        f"points_per_batch {k} must divide the '{axis}' axis size {m}")
    eng = make_eps_engine(
        model.sam.prompt_encoder, model.sam.mask_decoder, model.engine_cfg,
        spec_with_masks=model.output_rles,
        spec_allow_kernel=spec_allow_kernel,
        shard_axis=axis, shard_num=m,
    ).raw_fn
    sharded = shard_map(
        eng, mesh=mesh,
        in_specs=(P(),) * 11,
        out_specs=P(),
        check_rep=False,
    )
    jitted = jax.jit(sharded)
    rep = jax.sharding.NamedSharding(mesh, P())

    def call(*args):
        # Explicitly replicate inputs onto the mesh: upstream per-image
        # programs (the AOT-exported encode, utils/aot_cache.py) produce
        # arrays COMMITTED to a single device, which a multi-device jit
        # rejects as "incompatible devices" instead of auto-replicating.
        # device_put is a no-op for already-replicated leaves.
        args = jax.tree.map(lambda x: jax.device_put(x, rep), args)
        return jitted(*args)

    return call


def install_prompt_sharding(model, mesh, axis: str = "model",
                            spec_allow_kernel: bool = True):
    """Replace `model.engine` in place; `model.generate` then decodes every
    prompt batch across the mesh.  Returns the model."""
    model.engine = make_prompt_sharded_engine(
        model, mesh, axis=axis, spec_allow_kernel=spec_allow_kernel)
    return model
