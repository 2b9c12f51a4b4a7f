_base_ = ["./insseg-ppt-v1m1-0-pointgroup-spunet-ft.py"]
# 0.05 m voxel variant (reference
# configs/s3dis/insseg-ppt-v1m1-0-pointgroup-spunet-ft-vs0p05.py)

model = dict(voxel_size=0.05)
