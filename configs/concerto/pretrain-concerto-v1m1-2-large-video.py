_base_ = ["./pretrain-concerto-v1m1-1-large-base.py"]
# Concerto-large on video-frame image streams (reference
# configs/concerto/pretrain-concerto-v1m1-2-large-video.py): consecutive
# posed frames instead of sparse keyframes — more views per scene with a
# smaller frame gap at preprocessing time; training recipe is unchanged
# except view count.

model = dict(
    patch_h=16,
    patch_w=16,
)
data = dict(
    train=dict(
        max_images=16,  # denser temporal sampling from the video exporter
    ),
)
