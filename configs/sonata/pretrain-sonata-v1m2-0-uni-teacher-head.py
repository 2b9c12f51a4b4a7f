_base_ = ["./pretrain-sonata-v1m1-0-base.py"]
# Sonata with a unified (shared student/teacher) projection head (reference
# configs/sonata/pretrain-sonata-v1m2-0-uni-teacher-head.py)

model = dict(type="Sonata-v1m2", uni_head=True)
