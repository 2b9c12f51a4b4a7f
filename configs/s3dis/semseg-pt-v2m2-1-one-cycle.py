_base_ = ["./semseg-pt-v2m2-0-base.py"]
# PTv2 OneCycle recipe on S3DIS (reference
# configs/s3dis/semseg-pt-v2m2-1-one-cycle.py)

optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    pct_start=0.05,
    div_factor=10.0,
    final_div_factor=1000.0,
)
