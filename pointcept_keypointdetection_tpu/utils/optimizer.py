"""Optimizer construction (optax).

Parity surface: `pointcept/utils/optimizer.py` — SGD/Adam/AdamW with
``param_dicts`` keyword-matched parameter groups carrying per-group lr scales
and weight decay (used e.g. to give PTv3 "block" params 0.1x lr).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import optax


def _base_opt(opt_type: str, lr_schedule, momentum=0.9, weight_decay=0.0, nesterov=True, betas=(0.9, 0.999)):
    if opt_type == "SGD":
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(lr_schedule, momentum=momentum, nesterov=nesterov),
        )
    elif opt_type == "Adam":
        opt = optax.adam(lr_schedule, b1=betas[0], b2=betas[1])
    elif opt_type == "AdamW":
        opt = optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    else:
        raise KeyError(f"unsupported optimizer {opt_type}")
    return opt


def build_optimizer(
    cfg: Dict[str, Any],
    lr_schedule,
    param_labels=None,
    grad_clip: Optional[float] = None,
):
    """Build an optax GradientTransformation.

    ``cfg``: dict(type=..., lr=..., weight_decay=..., momentum=...,
    param_dicts=[{keyword: str, lr_scale: float}]).  When ``param_dicts`` is
    set, pass ``param_labels`` (a pytree of group names produced by
    ``label_params``) at call sites; matching groups get scaled lr.
    """
    cfg = dict(cfg)
    opt_type = cfg.pop("type")
    base_lr = cfg.pop("lr", None)
    param_dicts = cfg.pop("param_dicts", None)
    freeze_all_except = cfg.pop("freeze_all_except", None)
    kwargs = {}
    for key in ("momentum", "weight_decay", "nesterov", "betas"):
        if key in cfg:
            kwargs[key] = cfg.pop(key)

    transforms = []
    if freeze_all_except is not None:
        # LoRA-style fine-tuning: only params whose path contains the keyword
        # train; everything else gets zero updates (frozen backbone)
        opt = optax.multi_transform(
            {"train": _base_opt(opt_type, lr_schedule, **kwargs), "frozen": optax.set_to_zero()},
            param_labels,
        )
        if grad_clip:
            opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
        return opt
    if param_dicts:
        groups = {"default": _base_opt(opt_type, lr_schedule, **kwargs)}
        for i, group in enumerate(param_dicts):
            # reference configs give absolute per-group `lr` (optimizer.py:21-57);
            # convert to a scale on the shared schedule
            if "lr" in group and base_lr:
                scale = group["lr"] / base_lr
            else:
                scale = group.get("lr_scale", 1.0)
            g_kwargs = dict(kwargs)
            if "weight_decay" in group:
                g_kwargs["weight_decay"] = group["weight_decay"]
            scaled = lambda s, _sc=scale: lr_schedule(s) * _sc
            groups[f"group{i}"] = _base_opt(opt_type, scaled, **g_kwargs)
        opt = optax.multi_transform(groups, param_labels)
    else:
        opt = _base_opt(opt_type, lr_schedule, **kwargs)

    if grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def label_params(params, param_dicts: Sequence[Dict[str, Any]]):
    """Produce the multi_transform label pytree: first keyword match wins."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        name = "/".join(str(p) for p in path)
        label = "default"
        for i, group in enumerate(param_dicts):
            if group["keyword"] in name:
                label = f"group{i}"
                break
        labels[path] = label
    return flax.traverse_util.unflatten_dict(labels)


def label_params_freeze(params, train_keyword):
    """Label pytree for freeze_all_except: 'train' where the path contains any
    of the keyword(s) (e.g. 'lora', 'seg_head', or ('dec', 'seg_head') for
    Sonata-style decoder probes), 'frozen' otherwise."""
    import flax

    keywords = (
        (train_keyword,) if isinstance(train_keyword, str) else tuple(train_keyword)
    )
    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        path: "train"
        if any(kw in str(p) for kw in keywords for p in path)
        else "frozen"
        for path in flat
    }
    return flax.traverse_util.unflatten_dict(labels)
