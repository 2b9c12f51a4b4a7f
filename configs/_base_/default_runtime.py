# default runtime (parity surface: configs/_base_/default_runtime.py)
seed = None
save_path = None
weight = None
resume = False
evaluate = True
amp = None  # None | "bf16"
clip_grad = None
gradient_accumulation_steps = 1
remat = False

batch_size = 8
batch_size_val = None
slot_size = 32768  # padded points per sample slot
mix_prob = 0.0
eval_epoch = 100  # real epochs = eval_epoch; dataset loop multiplies data per epoch

train = dict(type="DefaultTrainer")

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver"),
]
enable_tensorboard = False
