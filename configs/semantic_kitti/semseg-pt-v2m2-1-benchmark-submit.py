_base_ = ["./semseg-pt-v2m2-0-base.py"]
# SemanticKITTI benchmark submission (reference
# configs/semantic_kitti/semseg-pt-v2m2-1-benchmark-submit.py): raw .label
# files under submit/sequences/<seq>/predictions via the inverse learning map.

save_submit = True
data = dict(test=dict(split="test"))
