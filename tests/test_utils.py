import os

import numpy as np
import pytest

from pointcept_keypointdetection_tpu.utils import Config, DictAction, EventStorage, Registry
from pointcept_keypointdetection_tpu.utils.misc import intersection_and_union, intersection_and_union_jax


def test_registry_build():
    R = Registry("things")

    @R.register_module()
    class Thing:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = R.build(dict(type="Thing", a=1))
    assert obj.a == 1 and obj.b == 2
    with pytest.raises(KeyError):
        R.build(dict(type="Missing"))
    with pytest.raises(KeyError):

        @R.register_module()  # duplicate
        class Thing:  # noqa
            pass


def test_config_base_merge(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(type='A', depth=2, head=dict(k=1))\nlr = 0.1\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = ['base.py']\n"
        "model = dict(depth=3, head=dict(_delete_=True, j=9))\n"
        "extra = [1, 2]\n"
    )
    cfg = Config.fromfile(str(child))
    assert cfg.model.type == "A"
    assert cfg.model.depth == 3
    assert cfg.model.head == dict(j=9)  # _delete_ replaced the dict
    assert cfg.lr == 0.1
    assert cfg.extra == [1, 2]

    cfg.merge_from_dict({"model.depth": 7, "new.nested": True})
    assert cfg.model.depth == 7
    assert cfg.new.nested is True

    # dump/reload roundtrip
    out = tmp_path / "dump.py"
    cfg.dump(str(out))
    cfg2 = Config.fromfile(str(out))
    assert cfg2.model.depth == 7


def test_dict_action_parsing():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--options", nargs="+", action=DictAction)
    ns = p.parse_args(["--options", "a=1", "b.c=[1,2]", "d=true", "e=hello"])
    assert ns.options == {"a": 1, "b.c": [1, 2], "d": True, "e": "hello"}


def test_event_storage():
    with EventStorage(window_size=3) as storage:
        for v in [1.0, 2.0, 3.0, 4.0]:
            storage.put_scalar("loss", v)
        assert storage.history("loss").latest == 4.0
        assert storage.history("loss").avg() == 3.0  # window of last 3
        assert storage.history("loss").global_avg() == 2.5


def test_intersection_and_union_matches_numpy():
    rng = np.random.default_rng(0)
    K = 5
    pred = rng.integers(0, K, 1000)
    target = rng.integers(-1, K, 1000)  # includes ignore_index
    i_np, u_np, t_np = intersection_and_union(pred, target, K, ignore_index=-1)

    import jax.numpy as jnp

    i_j, u_j, t_j = intersection_and_union_jax(jnp.asarray(pred), jnp.asarray(target), K, ignore_index=-1)
    np.testing.assert_array_equal(np.asarray(i_j), i_np)
    np.testing.assert_array_equal(np.asarray(u_j), u_np)
    np.testing.assert_array_equal(np.asarray(t_j), t_np)


def test_intersection_and_union_jax_respects_mask():
    import jax.numpy as jnp

    pred = jnp.array([0, 1, 2, 2])
    target = jnp.array([0, 1, 1, 2])
    mask = jnp.array([True, True, True, False])
    i, u, t = intersection_and_union_jax(pred, target, 3, valid_mask=mask)
    np.testing.assert_array_equal(np.asarray(i), [1, 1, 0])
    np.testing.assert_array_equal(np.asarray(t), [1, 2, 0])


def test_dataset_shared_cache(tmp_path, monkeypatch):
    """DefaultDataset(cache=True) round-trips samples through the /dev/shm
    cache (parity: `datasets/defaults.py:105-116` + DataCacheOperator)."""
    from pointcept_keypointdetection_tpu.datasets.defaults import DefaultDataset
    from pointcept_keypointdetection_tpu.utils import cache as shm_cache

    monkeypatch.setattr(shm_cache, "CACHE_ROOT", str(tmp_path / "shm"))
    root = tmp_path / "data" / "train" / "scene0"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    coord = rng.normal(size=(50, 3)).astype(np.float64)
    seg = rng.integers(0, 5, 50)
    np.save(root / "coord.npy", coord)
    np.save(root / "segment.npy", seg)

    ds = DefaultDataset(split="train", data_root=str(tmp_path / "data"), cache=True)
    first = ds.get_data(0)
    assert shm_cache.exists(f"pkt-{ds.data_list[0].replace(os.path.sep, '-')}")
    second = ds.get_data(0)
    np.testing.assert_allclose(second["coord"], first["coord"])
    np.testing.assert_array_equal(second["segment"], first["segment"])
    assert second["name"] == "scene0"


def test_label_params_freeze_multi_keyword():
    """freeze_all_except accepts a tuple of keywords (decoder probes train
    dec blocks AND the seg head while the encoder stays frozen)."""
    from pointcept_keypointdetection_tpu.utils.optimizer import label_params_freeze

    params = {
        "enc0_blocks": {"w": 1},
        "dec0_blocks": {"w": 2},
        "seg_head": {"kernel": 3},
    }
    labels = label_params_freeze(params, ("dec", "seg_head"))
    assert labels["enc0_blocks"]["w"] == "frozen"
    assert labels["dec0_blocks"]["w"] == "train"
    assert labels["seg_head"]["kernel"] == "train"
    labels1 = label_params_freeze(params, "seg_head")
    assert labels1["dec0_blocks"]["w"] == "frozen"
    assert labels1["seg_head"]["kernel"] == "train"


def test_dataloader_num_workers_matches_serial():
    """Parallel sample preparation yields the same batches as serial."""
    import numpy as np

    from pointcept_keypointdetection_tpu.datasets.dataloader import Dataloader

    class Ds:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            n = 20 + i
            return dict(coord=rng.normal(size=(n, 3)).astype(np.float32),
                        segment=np.full(n, i, np.int32))

    kw = dict(batch_size=3, slot_size=64, shuffle=True, drop_last=True, seed=7)
    a = list(Dataloader(Ds(), num_workers=0, prefetch=0, **kw))
    b = list(Dataloader(Ds(), num_workers=3, prefetch=2, **kw))
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        for k in x:
            if isinstance(x[k], np.ndarray):
                np.testing.assert_array_equal(x[k], y[k])
