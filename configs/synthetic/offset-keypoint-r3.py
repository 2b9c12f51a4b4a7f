_base_ = ["./offset-keypoint-full.py"]
# Round-3 floor-chasing run (VERDICT r2 item 6: drive keypoint error toward
# its floor).  Changes vs offset-keypoint-full:
#   * 4x the training pigs (128 scenes) — the synthetic generator is free, and
#     32 scenes left the model fitting per-scene noise;
#   * 2x the schedule (64 epochs, cosine);
#   * checkpoint selection on the WEIGHTED reconstruction (the reference's
#     own inference aggregation, `tools/infer_offset.py:573-597`): averaging
#     candidates over the mask cancels the ~19 mm per-point radial shell
#     noise the single-argmax estimate inherits.  Argmax is still reported
#     per epoch for reference-evaluator parity.

eval_epoch = 64
seed = 42

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="OffsetKeypointEvaluator", aggregate="weighted"),
    dict(type="CheckpointSaver"),
]

data = dict(
    train=dict(num_scenes=128, loop=1),
)
