_base_ = ["./semseg-pt-v2m2-0-base.py"]
# ScanNet benchmark submission run (reference
# configs/scannet/semseg-pt-v2m2-1-submit.py): inference over the unlabeled
# test split, writing per-scene txt label files.

save_submit = True
data = dict(test=dict(split="test"))
