"""Worker process for the 2-process jax.distributed test (not a pytest file).

Runs a tiny synthetic semseg training (train + SemSegEvaluator val +
CheckpointSaver) under a REAL multi-process mesh: 2 processes x 2 virtual CPU
devices each = one 4-device global data-parallel mesh with gloo cross-process
collectives.  Writes {metrics, best, steps} as JSON for the parent test to
compare across processes (reference contract: identical metrics and best-model
decisions on every rank, `hooks/evaluator.py:153-156`).

Usage: python mp_worker.py <pid> <nproc> <port> <save_root> <out_json>
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    save_root, out_json = sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pointcept_keypointdetection_tpu.engines.defaults import default_config_parser
    from pointcept_keypointdetection_tpu.engines.train import TRAINERS

    cfg = default_config_parser(
        os.path.join(repo, "configs", "synthetic", "semseg-spunet-mini.py"),
        options={
            "save_path": os.path.join(save_root, "exp"),
            "eval_epoch": 2,
            "slot_size": 1024,
            "data.train.num_points": 1500,
            "data.val.num_points": 1500,
            "model.backbone.bn_momentum": 0.2,
        },
    )
    trainer = TRAINERS.build({"type": "DefaultTrainer", "cfg": cfg})
    trainer.train()

    result = {
        "pid": pid,
        "nproc": nproc,
        "n_global_devices": len(jax.devices()),
        "best_metric": float(trainer.best_metric_value),
        "steps": int(trainer.state.step),
        "ckpt_exists": os.path.isfile(
            os.path.join(cfg.save_path, "model", "model_best.ckpt")
        ),
    }
    with open(out_json, "w") as f:
        json.dump(result, f)
    print("WORKER_OK", json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
