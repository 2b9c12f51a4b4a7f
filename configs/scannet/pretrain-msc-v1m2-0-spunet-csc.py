_base_ = ["./pretrain-msc-v1m1-0-spunet-base.py"]
# Contrastive Scene Contexts (reference
# configs/scannet/pretrain-msc-v1m2-0-spunet-csc.py): InfoNCE negatives
# partitioned into 4 spatial bins (z up/down x inner/outer radius) around
# each anchor.

model = dict(
    type="MSC-v1m2",
    partitions=4,
    partition_radius=2.0,
)
