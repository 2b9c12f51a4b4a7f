"""Numeric parity against the REFERENCE's own implementations.

These tests load individual modules from the reference checkout (torch CPU)
and compare outputs with this framework's implementations on random inputs —
a stronger check than hand-derived goldens.  They are skipped when the
reference tree is absent (e.g. in a standalone deployment of this repo).

Loaded modules are self-contained or need only a stubbed registry; nothing
from the reference is imported into the package itself.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


class _StubRegistry:
    def __init__(self, *args, **kwargs):
        pass

    def register_module(self, *args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(x):
            return x

        return deco


class _IdentityCompose:
    """Stands in for the reference Compose when no transforms are configured."""

    def __init__(self, cfg=None):
        pass

    def __call__(self, data_dict):
        return data_dict


def _load_ref(relpath, name, stubs=(), absolute_stubs=()):
    """Load one reference module by path; relative imports resolve against a
    synthetic package whose submodules are no-op registries; unavailable
    absolute imports (wandb, pointops, ...) become empty attribute sinks."""
    pkg_name = "refora"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = []
        sys.modules[pkg_name] = pkg
    for stub in stubs:
        mod = types.ModuleType(f"{pkg_name}.{stub}")
        for attr in ("LOSSES", "SCHEDULERS", "MODELS", "Registry", "HOOKS", "DATASETS", "TRANSFORMS"):
            setattr(mod, attr, _StubRegistry() if attr != "Registry" else _StubRegistry)
        mod.HookBase = object
        sys.modules[f"{pkg_name}.{stub}"] = mod
    for abs_name in absolute_stubs:
        if abs_name in sys.modules:
            continue
        mod = types.ModuleType(abs_name)
        mod.__path__ = []
        mod.Registry = _StubRegistry
        mod.DATASETS = _StubRegistry()
        mod.TRANSFORMS = _StubRegistry()
        mod.Compose = _IdentityCompose

        def _stub_getattr(attr):
            # inspect & friends probe dunders on modules; answering them with
            # lambdas breaks them — only stub regular names
            if attr.startswith("__"):
                raise AttributeError(attr)
            return lambda *a, **k: None

        mod.__getattr__ = _stub_getattr
        sys.modules[abs_name] = mod
        # wire dotted children onto their parents so `import a.b.c as c` works
        if "." in abs_name:
            parent, child = abs_name.rsplit(".", 1)
            if parent in sys.modules:
                setattr(sys.modules[parent], child, mod)
    spec = importlib.util.spec_from_file_location(
        f"{pkg_name}.{name}", os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = pkg_name
    sys.modules[f"{pkg_name}.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# serialization codecs: bit-for-bit (they define model behavior via ordering)
# ---------------------------------------------------------------------------


def test_z_order_codec_bit_parity(rng):
    import torch

    ref = _load_ref(
        "pointcept/models/utils/serialization/z_order.py", "z_order"
    )
    from pointcept_keypointdetection_tpu.ops.serialization import z_order_encode_np

    grid = rng.integers(0, 2**16, (5000, 3)).astype(np.int64)
    t = torch.from_numpy(grid)
    ref_code = ref.xyz2key(t[:, 0], t[:, 1], t[:, 2], depth=16).numpy().astype(np.uint64)
    ours = z_order_encode_np(grid, depth=16).astype(np.uint64)
    np.testing.assert_array_equal(ours, ref_code)


def test_hilbert_codec_bit_parity(rng):
    import torch

    ref = _load_ref(
        "pointcept/models/utils/serialization/hilbert.py", "hilbert"
    )
    from pointcept_keypointdetection_tpu.ops.serialization import hilbert_encode_np

    grid = rng.integers(0, 2**16, (3000, 3)).astype(np.int64)
    ref_code = ref.encode(torch.from_numpy(grid), num_dims=3, num_bits=16).numpy().astype(np.uint64)
    ours = hilbert_encode_np(grid, depth=16).astype(np.uint64)
    np.testing.assert_array_equal(ours, ref_code)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_lovasz_loss_parity(rng):
    import torch

    ref_mod = _load_ref(
        "pointcept/models/losses/lovasz.py", "lovasz", stubs=("builder",)
    )
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.losses import build_criteria

    n, k = 500, 7
    logits = rng.normal(size=(n, k)).astype(np.float32)
    labels = rng.integers(0, k, n).astype(np.int64)
    labels[:30] = -1  # ignored

    ref_loss = ref_mod.LovaszLoss(mode="multiclass", ignore_index=-1)
    ref_val = float(
        ref_loss(torch.from_numpy(logits), torch.from_numpy(labels))
    )

    ours = build_criteria([dict(type="LovaszLoss", mode="multiclass", ignore_index=-1)])
    our_val = float(ours(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32))))
    assert our_val == pytest.approx(ref_val, rel=1e-4), (our_val, ref_val)


def test_cross_entropy_parity(rng):
    import torch
    import torch.nn.functional as F

    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.losses import build_criteria

    n, k = 400, 9
    logits = rng.normal(size=(n, k)).astype(np.float32)
    labels = rng.integers(0, k, n).astype(np.int64)
    labels[:25] = -1

    ref_val = float(
        F.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(labels), ignore_index=-1
        )
    )
    ours = build_criteria([dict(type="CrossEntropyLoss", ignore_index=-1)])
    our_val = float(ours(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32))))
    assert our_val == pytest.approx(ref_val, rel=1e-5)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_intersection_and_union_parity(rng):
    ref = _load_ref("pointcept/utils/misc.py", "ref_misc")
    from pointcept_keypointdetection_tpu.utils.misc import intersection_and_union

    k = 13
    pred = rng.integers(0, k, 2000).astype(np.int64)
    gt = rng.integers(-1, k, 2000).astype(np.int64)
    ri, ru, rt = ref.intersection_and_union(pred.copy(), gt, k, ignore_index=-1)
    oi, ou, ot = intersection_and_union(pred, gt, k, ignore_index=-1)
    np.testing.assert_array_equal(np.asarray(oi), ri)
    np.testing.assert_array_equal(np.asarray(ou), ru)
    np.testing.assert_array_equal(np.asarray(ot), rt)


# ---------------------------------------------------------------------------
# LR schedules: reference torch schedulers vs our optax-style schedules
# ---------------------------------------------------------------------------


def _ref_lr_curve(sched_cls, total, base_lr, **kwargs):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = sched_cls(optimizer=opt, total_steps=total, **kwargs)
    lrs = []
    for _ in range(total):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(lrs)


@pytest.fixture(scope="module")
def ref_sched():
    return _load_ref("pointcept/utils/scheduler.py", "ref_sched", stubs=("registry",))


def test_poly_lr_parity(ref_sched):
    from pointcept_keypointdetection_tpu.utils.scheduler import build_scheduler

    total, base = 200, 0.1
    ref = _ref_lr_curve(ref_sched.PolyLR, total, base, power=0.9)
    ours = build_scheduler(dict(type="PolyLR", power=0.9), total, base)
    got = np.asarray([float(ours(s)) for s in range(total)])
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_multistep_warmup_lr_parity(ref_sched):
    from pointcept_keypointdetection_tpu.utils.scheduler import build_scheduler

    total, base = 300, 0.05
    kwargs = dict(milestones=[0.6, 0.8], gamma=0.1, warmup_rate=0.05, warmup_scale=1e-6)
    ref = _ref_lr_curve(ref_sched.MultiStepWithWarmupLR, total, base, **kwargs)
    ours = build_scheduler(dict(type="MultiStepWithWarmupLR", **kwargs), total, base)
    got = np.asarray([float(ours(s)) for s in range(total)])
    # allow off-by-one at the warmup/milestone boundary steps
    mismatch = np.abs(got - ref) / np.maximum(ref, 1e-9) > 1e-4
    assert mismatch.mean() < 0.02, f"{mismatch.sum()} of {total} steps differ"


def test_exp_lr_parity(ref_sched):
    from pointcept_keypointdetection_tpu.utils.scheduler import build_scheduler

    total, base = 150, 0.01
    ref = _ref_lr_curve(ref_sched.ExpLR, total, base, gamma=0.7)
    ours = build_scheduler(dict(type="ExpLR", gamma=0.7), total, base)
    got = np.asarray([float(ours(s)) for s in range(total)])
    np.testing.assert_allclose(got, ref, rtol=1e-4)


# ---------------------------------------------------------------------------
# instance segmentation AP matcher (ScanNet-style)
# ---------------------------------------------------------------------------


def test_insseg_ap_matcher_parity(rng):
    """Our associate/evaluate/summarize pipeline must reproduce the
    reference's AP matrix on random noisy instance predictions."""
    import types

    import torch

    ref_ev_mod = _load_ref(
        "pointcept/engines/hooks/evaluator.py",
        "ref_evaluator",
        stubs=("default", "builder"),
        absolute_stubs=(
            "wandb",
            "pointops",
            "pointcept",
            "pointcept.utils",
            "pointcept.utils.comm",
            "pointcept.utils.misc",
        ),
    )

    from pointcept_keypointdetection_tpu.engines.hooks.insseg_evaluator import (
        OVERLAPS,
        associate_instances,
        evaluate_matches,
        summarize_ap,
    )

    K = 5
    seg_ignore = (-1, 0)
    names = [f"class{i}" for i in range(K)]

    def make_scene(seed):
        r = np.random.default_rng(seed)
        n = 3000
        # ground truth: 6 instances across classes 1..4
        instance = np.full(n, -1, np.int64)
        segment = np.full(n, -1, np.int64)
        start = 0
        insts = []
        for i in range(6):
            size = int(r.integers(150, 500))
            cls = int(r.integers(1, K))
            instance[start : start + size] = i
            segment[start : start + size] = cls
            insts.append((i, cls, start, size))
            start += size
        segment[start:] = 0  # ignored background

        # predictions: noisy copies of gt + one spurious
        pred_masks, pred_classes, pred_scores = [], [], []
        for i, cls, s, size in insts:
            m = np.zeros(n, bool)
            keep = r.random(size) > 0.25  # drop 25%
            m[s : s + size] = keep
            extra = r.integers(0, n, 60)
            m[extra] = True  # bleed into other regions
            pred_masks.append(m)
            pred_classes.append(cls if r.random() > 0.2 else int(r.integers(1, K)))
            pred_scores.append(float(r.random()))
        m = np.zeros(n, bool)
        m[r.integers(0, n, 400)] = True
        pred_masks.append(m)
        pred_classes.append(int(r.integers(1, K)))
        pred_scores.append(float(r.random()))
        return (
            np.asarray(pred_classes, np.int64),
            np.asarray(pred_scores, np.float32),
            np.stack(pred_masks),
            segment,
            instance,
        )

    # reference evaluator with a faked trainer context
    ev = ref_ev_mod.InsSegEvaluator(
        segment_ignore_index=seg_ignore, instance_ignore_index=-1
    )
    ev.trainer = types.SimpleNamespace(
        cfg=types.SimpleNamespace(
            data=types.SimpleNamespace(names=names, num_classes=K)
        )
    )
    ev.valid_class_names = [names[i] for i in range(K) if i not in seg_ignore]

    ref_scenes, our_scenes = [], []
    for seed in range(3):
        pc, ps, pm, segment, instance = make_scene(seed)
        pred = dict(pred_classes=pc, pred_scores=ps, pred_masks=pm)
        gt_i, pr_i = ev.associate_instances(
            pred, torch.from_numpy(segment), torch.from_numpy(instance)
        )
        ref_scenes.append(dict(gt=gt_i, pred=pr_i))
        gt_o, pr_o = associate_instances(
            pc, ps, pm, segment, instance, K,
            segment_ignore_index=seg_ignore, instance_ignore_index=-1,
        )
        our_scenes.append(dict(gt=gt_o, pr=pr_o))

    ref_scores = ev.evaluate_matches(ref_scenes)

    class_ids = [i for i in range(K) if i not in seg_ignore]
    our_ap = evaluate_matches(our_scenes, class_ids)
    assert our_ap.shape == (len(class_ids), len(OVERLAPS))
    all_ap, ap50, ap25 = summarize_ap(our_ap)

    assert all_ap == pytest.approx(ref_scores["all_ap"], abs=1e-9)
    assert ap50 == pytest.approx(ref_scores["all_ap_50%"], abs=1e-9)
    assert ap25 == pytest.approx(ref_scores["all_ap_25%"], abs=1e-9)
    # per-class AP over the main overlap range
    main = ~np.isclose(OVERLAPS, 0.25)
    for ci, c in enumerate(class_ids):
        ref_cls = ref_scores["classes"][names[c]]["ap"]
        assert np.nanmean(our_ap[ci, main]) == pytest.approx(ref_cls, abs=1e-9), names[c]


# ---------------------------------------------------------------------------
# more losses
# ---------------------------------------------------------------------------


def _ref_losses():
    return _load_ref(
        "pointcept/models/losses/misc.py", "ref_losses", stubs=("builder",)
    )


def test_focal_loss_parity(rng):
    import torch

    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.losses import build_criteria

    ref_mod = _ref_losses()
    n, k = 300, 6
    logits = rng.normal(size=(n, k)).astype(np.float32)
    labels = rng.integers(0, k, n).astype(np.int64)
    labels[:20] = -1
    ref = float(
        ref_mod.FocalLoss(gamma=2.0, alpha=0.5, ignore_index=-1)(
            torch.from_numpy(logits), torch.from_numpy(labels)
        )
    )
    ours = build_criteria([dict(type="FocalLoss", gamma=2.0, alpha=0.5, ignore_index=-1)])
    got = float(ours(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32))))
    assert got == pytest.approx(ref, rel=1e-4), (got, ref)


def test_binary_focal_loss_parity(rng):
    import torch

    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.losses import build_criteria

    ref_mod = _ref_losses()
    n = 400
    logits = rng.normal(size=(n,)).astype(np.float32)
    labels = rng.integers(0, 2, n).astype(np.float32)
    ref = float(
        ref_mod.BinaryFocalLoss(gamma=2.0, alpha=0.25)(
            torch.from_numpy(logits), torch.from_numpy(labels)
        )
    )
    ours = build_criteria([dict(type="BinaryFocalLoss", gamma=2.0, alpha=0.25)])
    got = float(ours(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=1e-4), (got, ref)


def test_dice_loss_parity(rng):
    import torch

    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.models.losses import build_criteria

    ref_mod = _ref_losses()
    n, k = 300, 5
    logits = rng.normal(size=(n, k)).astype(np.float32)
    labels = rng.integers(0, k, n).astype(np.int64)
    ref = float(
        ref_mod.DiceLoss(smooth=1, exponent=2, ignore_index=-1)(
            torch.from_numpy(logits), torch.from_numpy(labels)
        )
    )
    ours = build_criteria([dict(type="DiceLoss", smooth=1, exponent=2, ignore_index=-1)])
    got = float(ours(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32))))
    assert got == pytest.approx(ref, rel=1e-4), (got, ref)


# ---------------------------------------------------------------------------
# codec decode
# ---------------------------------------------------------------------------


def test_z_order_decode_roundtrip_parity(rng):
    import torch

    ref = _load_ref("pointcept/models/utils/serialization/z_order.py", "z_order2")
    from pointcept_keypointdetection_tpu.ops.serialization import z_order_encode_np

    grid = rng.integers(0, 2**16, (2000, 3)).astype(np.int64)
    code = z_order_encode_np(grid, depth=16).astype(np.int64)
    x, y, z, _b = ref.key2xyz(torch.from_numpy(code), depth=16)
    back = np.stack([x.numpy(), y.numpy(), z.numpy()], 1)
    np.testing.assert_array_equal(back, grid)


def test_hilbert_decode_roundtrip_parity(rng):
    import torch

    ref = _load_ref("pointcept/models/utils/serialization/hilbert.py", "hilbert2")
    from pointcept_keypointdetection_tpu.ops.serialization import hilbert_encode_np

    grid = rng.integers(0, 2**16, (1500, 3)).astype(np.int64)
    code = hilbert_encode_np(grid, depth=16).astype(np.int64)
    back = ref.decode(torch.from_numpy(code), num_dims=3, num_bits=16).numpy()
    np.testing.assert_array_equal(back, grid)


# ---------------------------------------------------------------------------
# GridSample: identical voxel-partition semantics (order-invariant — our key
# is the Morton code, the reference's is an FNV hash; the partition must
# agree exactly, the within-sort order need not)
# ---------------------------------------------------------------------------


def test_gridsample_partition_parity(rng):
    ref_mod = _load_ref(
        "pointcept/datasets/transform.py",
        "ref_transform",
        absolute_stubs=("torchvision", "pointcept", "pointcept.utils",
                        "pointcept.utils.registry"),
    )
    from pointcept_keypointdetection_tpu.datasets.transform import TRANSFORMS

    n = 4000
    coord = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 3)).astype(np.float32)

    def voxel_of(c, grid):  # voxel id per point, reference arithmetic
        g = np.floor(c / grid).astype(np.int64)
        g -= g.min(0)
        return g[:, 0] * 10**12 + g[:, 1] * 10**6 + g[:, 2]

    vox = voxel_of(coord, 0.1)

    ref_gs = ref_mod.GridSample(grid_size=0.1, hash_type="fnv", mode="test",
                                return_inverse=True, return_grid_coord=True)
    our_gs = TRANSFORMS.build(dict(type="GridSample", grid_size=0.1, hash_type="fnv",
                                   mode="test", return_inverse=True, return_grid_coord=True))
    ref_parts = ref_gs(dict(coord=coord.copy(), color=feat.copy()))
    our_parts = our_gs(dict(coord=coord.copy(), color=feat.copy()))

    assert len(ref_parts) == len(our_parts)  # count.max() splits
    # every part selects exactly one point per voxel
    n_vox = len(np.unique(vox))
    for rp, op in zip(ref_parts, our_parts):
        assert len(rp["index"]) == len(op["index"]) == n_vox
        assert len(np.unique(vox[rp["index"]])) == n_vox
        assert len(np.unique(vox[op["index"]])) == n_vox
    # exhaustive: every point appears at least once, and the multiset of
    # appearance counts matches
    ref_counts = np.bincount(np.concatenate([p["index"] for p in ref_parts]), minlength=n)
    our_counts = np.bincount(np.concatenate([p["index"] for p in our_parts]), minlength=n)
    assert ref_counts.min() >= 1 and our_counts.min() >= 1
    np.testing.assert_array_equal(np.sort(ref_counts), np.sort(our_counts))
    # inverse maps define the SAME partition (equal up to label renaming)
    ri = ref_parts[0]["inverse"]
    oi = our_parts[0]["inverse"]
    pairing = {}
    for a, b in zip(ri, oi):
        assert pairing.setdefault(a, b) == b
    assert len(set(pairing.values())) == len(pairing)
    # grid_coord arithmetic identical (checked against the reference formula
    # on each side's own selected points — the per-voxel representative is
    # random, so cross-aligning by point index is meaningless)
    g_all = np.floor(coord / 0.1).astype(np.int64)
    g_all -= g_all.min(0)
    np.testing.assert_array_equal(ref_parts[0]["grid_coord"], g_all[ref_parts[0]["index"]])
    np.testing.assert_array_equal(our_parts[0]["grid_coord"], g_all[our_parts[0]["index"]])


def test_gridsample_train_mode_parity(rng):
    ref_mod = sys.modules.get("refora.ref_transform") or _load_ref(
        "pointcept/datasets/transform.py",
        "ref_transform",
        absolute_stubs=("torchvision", "pointcept", "pointcept.utils",
                        "pointcept.utils.registry"),
    )
    from pointcept_keypointdetection_tpu.datasets.transform import TRANSFORMS

    n = 3000
    coord = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    seg = rng.integers(0, 5, n).astype(np.int64)

    def voxel_of(c, grid):
        g = np.floor(c / grid).astype(np.int64)
        g -= g.min(0)
        return g[:, 0] * 10**12 + g[:, 1] * 10**6 + g[:, 2]

    vox = voxel_of(coord, 0.15)
    ref_gs = ref_mod.GridSample(grid_size=0.15, hash_type="fnv", mode="train",
                                return_grid_coord=True)
    our_gs = TRANSFORMS.build(dict(type="GridSample", grid_size=0.15, hash_type="fnv",
                                   mode="train", return_grid_coord=True))
    ref_out = ref_gs(dict(coord=coord.copy(), segment=seg.copy()))
    our_out = our_gs(dict(coord=coord.copy(), segment=seg.copy()))
    # one (random) point per voxel on both sides: same voxel SET, same count
    assert len(ref_out["coord"]) == len(our_out["coord"]) == len(np.unique(vox))
    np.testing.assert_array_equal(
        np.sort(voxel_of(ref_out["coord"], 0.15)),
        np.sort(voxel_of(our_out["coord"], 0.15)),
    )


# ---------------------------------------------------------------------------
# the fork's keypoint datasets: identical normalization + online targets
# ---------------------------------------------------------------------------


def _keypoint_fixture(tmp_path, rng, n=600, k=6):
    split = tmp_path / "train"
    (split / "pointclouds").mkdir(parents=True)
    (split / "keypoints").mkdir()
    cloud = np.concatenate(
        [rng.uniform(0, 800, (n, 3)), rng.normal(size=(n, 4))], axis=1
    ).astype(np.float32)
    kp = rng.uniform(100, 700, (k, 3)).astype(np.float32)
    np.save(split / "pointclouds" / "20260329_105410.npy", cloud)
    np.save(split / "keypoints" / "20260329_105410_关键点坐标.npy", kp)
    return str(tmp_path)


def _ref_dataset_module(fname, name):
    # stub .transform with an identity Compose (no transforms configured)
    class _Compose:
        def __init__(self, cfg=None):
            pass

        def __call__(self, d):
            return d

    mod = _load_ref(
        f"pointcept/datasets/{fname}", name, stubs=("builder", "transform")
    )
    return mod, _Compose


def test_keypoint_dataset_normalization_parity(rng, tmp_path):
    # patch the stubbed Compose BEFORE loading (module binds it at import)
    pkg = "refora"
    import types as _t

    tmod = _t.ModuleType(f"{pkg}.transform")

    class _Compose:
        def __init__(self, cfg=None):
            pass

        def __call__(self, d):
            return d

    tmod.Compose = _Compose
    tmod.TRANSFORMS = _StubRegistry()
    sys.modules[f"{pkg}.transform"] = tmod
    ref_mod = _load_ref(
        "pointcept/datasets/keypoint_dataset.py", "ref_kpds", stubs=("builder",)
    )

    from pointcept_keypointdetection_tpu.datasets import DATASETS

    root = _keypoint_fixture(tmp_path, rng)
    ref_ds = ref_mod.KeypointDataset(split="train", data_root=root, transform=None)
    our_ds = DATASETS.build(
        dict(type="KeypointDataset", split="train", data_root=root, transform=[])
    )
    r = ref_ds[0]
    o = our_ds[0]
    np.testing.assert_allclose(np.asarray(o["coord"]), np.asarray(r["coord"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o["keypoint"]), np.asarray(r["target"]), rtol=1e-6)
    np.testing.assert_allclose(float(o["scale"]), float(r["scale"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o["centroid"]), np.asarray(r["centroid"]), rtol=1e-6)


def test_offset_keypoint_dataset_parity(rng, tmp_path):
    pkg = "refora"
    import types as _t

    tmod = _t.ModuleType(f"{pkg}.transform")

    class _Compose:
        def __init__(self, cfg=None):
            pass

        def __call__(self, d):
            return d

    tmod.Compose = _Compose
    tmod.TRANSFORMS = _StubRegistry()
    sys.modules[f"{pkg}.transform"] = tmod
    # this module imports pointcept.datasets.{builder,transform} ABSOLUTELY
    for mname in ("pointcept.datasets.builder", "pointcept.datasets.transform"):
        sys.modules.pop(mname, None)
    ref_mod = _load_ref(
        "pointcept/datasets/offset_keypoint_dataset.py", "ref_okpds", stubs=("builder",),
        absolute_stubs=("pointcept", "pointcept.datasets",
                        "pointcept.datasets.builder", "pointcept.datasets.transform"),
    )

    from pointcept_keypointdetection_tpu.datasets import DATASETS

    root = _keypoint_fixture(tmp_path, rng)
    ref_ds = ref_mod.OffsetKeypointDataset(
        split="train", data_root=root, transform=None, offset_radius=300.0
    )
    our_ds = DATASETS.build(
        dict(type="OffsetKeypointDataset", split="train", data_root=root,
             transform=[], offset_radius=300.0)
    )
    r = ref_ds[0]
    o = our_ds[0]
    np.testing.assert_allclose(np.asarray(o["coord"]), np.asarray(r["coord"]), rtol=1e-6)
    # reference packs (offset*mask, mask) into target [N, K, 4]
    ref_target = np.asarray(r["target"])
    our_offset = np.asarray(o["keypoint_offset"])
    our_mask = np.asarray(o["keypoint_mask"])
    np.testing.assert_allclose(our_mask, ref_target[..., 3], rtol=1e-6)
    np.testing.assert_allclose(
        our_offset * our_mask[..., None], ref_target[..., :3], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(o["scale"]), float(r["scale"]), rtol=1e-6)


# ---------------------------------------------------------------------------
# deterministic transforms + OneCycleLR
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_transform():
    return _load_ref(
        "pointcept/datasets/transform.py",
        "ref_transform",
        absolute_stubs=("torchvision", "pointcept", "pointcept.utils",
                        "pointcept.utils.registry"),
    )


def test_deterministic_transforms_parity(rng, ref_transform):
    from pointcept_keypointdetection_tpu.datasets.transform import TRANSFORMS

    coord = rng.uniform(-50, 90, (1000, 3)).astype(np.float32)
    color = rng.uniform(0, 255, (1000, 3)).astype(np.float32)

    cases = [
        (ref_transform.CenterShift(apply_z=True), dict(type="CenterShift", apply_z=True)),
        (ref_transform.CenterShift(apply_z=False), dict(type="CenterShift", apply_z=False)),
        (ref_transform.NormalizeColor(), dict(type="NormalizeColor")),
        (ref_transform.NormalizeCoord(), dict(type="NormalizeCoord")),
        (
            ref_transform.PointClip(point_cloud_range=(-40, -40, -2, 40, 40, 1)),
            dict(type="PointClip", point_cloud_range=(-40, -40, -2, 40, 40, 1)),
        ),
    ]
    for ref_t, our_cfg in cases:
        r = ref_t(dict(coord=coord.copy(), color=color.copy()))
        o = TRANSFORMS.build(dict(our_cfg))(dict(coord=coord.copy(), color=color.copy()))
        np.testing.assert_allclose(
            np.asarray(o["coord"]), np.asarray(r["coord"]), rtol=1e-6, atol=1e-6,
            err_msg=str(our_cfg),
        )
        np.testing.assert_allclose(
            np.asarray(o["color"]), np.asarray(r["color"]), rtol=1e-6,
            err_msg=str(our_cfg),
        )


def test_onecycle_lr_parity(ref_sched):
    from pointcept_keypointdetection_tpu.utils.scheduler import build_scheduler

    total, max_lr = 250, 0.01
    kwargs = dict(pct_start=0.05, div_factor=10.0, final_div_factor=1000.0)
    ref = _ref_lr_curve(
        ref_sched.OneCycleLR, total, max_lr / kwargs["div_factor"],
        max_lr=max_lr, anneal_strategy="cos", cycle_momentum=False, **kwargs
    )
    ours = build_scheduler(dict(type="OneCycleLR", **kwargs), total, max_lr)
    got = np.asarray([float(ours(s)) for s in range(total)])
    # same cosine-onecycle shape up to torch's step indexing
    assert abs(got.max() - ref.max()) / ref.max() < 1e-3
    assert np.argmax(got) == pytest.approx(np.argmax(ref), abs=2)
    # pointwise within 5% of max_lr (off-by-one phase boundaries), tight in bulk
    assert np.max(np.abs(got - ref)) < 0.05 * max_lr, np.max(np.abs(got - ref))
    assert np.percentile(np.abs(got - ref), 90) < 0.01 * max_lr
