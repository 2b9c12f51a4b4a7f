"""MaskedSceneContrast SSL: view generation, correspondence matching, loss."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.datasets.collate import collate, pad_sample
from pointcept_keypointdetection_tpu.datasets.transform import TRANSFORMS
from pointcept_keypointdetection_tpu.engines.common import build_point_batch
from pointcept_keypointdetection_tpu.models import MODELS
from pointcept_keypointdetection_tpu.models.masked_scene_contrast import match_views


def test_match_views_exact(rng):
    n = 64
    origin1 = jnp.asarray(rng.permutation(100)[:n].astype(np.int64))
    origin2 = jnp.asarray(rng.permutation(100)[:n].astype(np.int64))
    valid = jnp.ones(n, bool)
    batch = jnp.zeros(n, jnp.int32)
    idx1, idx2, mvalid = match_views(origin1, valid, origin2, valid, batch, 64, n)
    o1 = np.asarray(origin1)
    o2 = np.asarray(origin2)
    common = set(o1) & set(o2)
    assert int(mvalid.sum()) == len(common)
    i1 = np.asarray(idx1)[np.asarray(mvalid)]
    i2 = np.asarray(idx2)[np.asarray(mvalid)]
    np.testing.assert_array_equal(o1[i1], o2[i2])


def _ssl_sample(rng, n=600):
    coord = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    # colors normalized to [0, 1] as every real config does (NormalizeColor
    # precedes the view generator); the reconstruction target is regressed raw
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    gen = TRANSFORMS.build(
        dict(
            type="ContrastiveViewsGenerator",
            view_keys=("coord", "color"),
            view_trans_cfg=[
                dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
                dict(type="RandomJitter", sigma=0.003, clip=0.01),
                dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            ],
        )
    )
    return gen(dict(coord=coord, color=color))


def test_msc_forward_and_learn(rng):
    import optax

    sample = _ssl_sample(rng)
    slot = 512
    batch_np = collate([pad_sample(sample, slot)], slot)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, (list, int))}
    point = build_point_batch(batch, 1)

    model = MODELS.build(
        dict(
            type="MSC-v1m1",
            backbone=dict(
                type="SpUNet-v1m1",
                in_channels=3,
                num_classes=0,
                base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
                stem_kernel=3,
            ),
            backbone_in_channels=3,
            backbone_out_channels=8,
            num_matches=256,
        )
    )
    import functools

    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, point, batch)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, point, batch, train=True,
                mutable=["batch_stats"], rngs={"mask": key, "dropout": key},
            )
            return out["loss"], (mut.get("batch_stats", {}), out)

        (loss, (new_bs, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt2 = tx.update(grads, opt)
        return optax.apply_updates(params, upd), new_bs, opt2, loss

    losses = []
    for i in range(15):
        params, bs, opt, loss = step(params, bs, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_msc_csc_partitioned_nce(rng):
    """MSC-v1m2 (CSC): partitioned InfoNCE is finite, differs from the plain
    loss, and still sees the positive in every partition
    (`masked_scene_contrast_v1m2_csc.py:182-252`)."""
    import functools

    sample = _ssl_sample(rng)
    slot = 512
    batch_np = collate([pad_sample(sample, slot)], slot)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items() if not isinstance(v, (list, int))}
    point = build_point_batch(batch, 1)

    def build(partitions):
        return MODELS.build(
            dict(
                type="MSC-v1m2" if partitions else "MSC-v1m1",
                backbone=dict(
                    type="SpUNet-v1m1",
                    in_channels=3,
                    num_classes=0,
                    base_channels=8,
                    channels=(8, 16, 16, 16, 16, 16, 8, 8),
                    layers=(1, 1, 1, 1, 1, 1, 1, 1),
                    stem_kernel=3,
                ),
                backbone_in_channels=3,
                backbone_out_channels=8,
                num_matches=128,
                partitions=partitions,
                partition_radius=0.5,
            )
        )

    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    losses = {}
    for parts in (0, 4):
        model = build(parts)
        variables = jax.jit(functools.partial(model.init, train=True))(rngs, point, batch)
        out, _ = model.apply(
            variables, point, batch, train=True, mutable=["batch_stats"],
            rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        )
        losses[parts] = float(out["contrast_loss"])
        assert np.isfinite(losses[parts])
    # partitioned softmax has fewer negatives per row -> smaller NCE loss
    assert losses[4] < losses[0]
