"""Export trained prompt pytrees as reference-format (PyTorch/Dassl)
checkpoints — the inverse of ``models/import_reference.py``.

Lets a user validate prompts trained here inside the reference stack (or
hand results to collaborators still on it): the produced
``torch.save({"state_dict", "epoch"})`` pickle loads through the
reference's own ``load_model`` (which reads ``checkpoint["state_dict"]``
and calls ``load_state_dict(strict=False)`` after deleting the
class-dependent token prefix/suffix buffers — reference
trainers/mudpt.py:286-303), so only the learned prompt weights need to be
present.  Key mapping is the exact inverse of the importer: our (in, out)
linear weights transpose back to torch's (out, in), LN scale/bias become
weight/bias, and the fused ``qkv_w`` splits back into
``nn.MultiheadAttention``'s ``in_proj_weight``.

The trainer family is inferred from the pytree's key signature, mirroring
the importer's detection.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(x) -> "np.ndarray":
    return np.asarray(x, dtype=np.float32)


def _lin(out: Dict[str, Any], prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _t(p["w"]).T.copy()
    out[prefix + ".bias"] = _t(p["b"])


def _ln(out: Dict[str, Any], prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _t(p["scale"])
    out[prefix + ".bias"] = _t(p["bias"])


def _light_transformer(out: Dict[str, Any], prefix: str, p: dict) -> None:
    _ln(out, f"{prefix}.ln_1", p["ln_1"])
    out[f"{prefix}.attn.in_proj_weight"] = _t(p["attn"]["qkv_w"]).T.copy()
    out[f"{prefix}.attn.in_proj_bias"] = _t(p["attn"]["qkv_b"])
    out[f"{prefix}.attn.out_proj.weight"] = _t(p["attn"]["out_w"]).T.copy()
    out[f"{prefix}.attn.out_proj.bias"] = _t(p["attn"]["out_b"])
    _ln(out, f"{prefix}.ln_2", p["ln_2"])
    out[f"{prefix}.mlp.c_fc.weight"] = _t(p["mlp"]["fc_w"]).T.copy()
    out[f"{prefix}.mlp.c_fc.bias"] = _t(p["mlp"]["fc_b"])
    out[f"{prefix}.mlp.c_proj.weight"] = _t(p["mlp"]["proj_w"]).T.copy()
    out[f"{prefix}.mlp.c_proj.bias"] = _t(p["mlp"]["proj_b"])


def _head(out: Dict[str, Any], p: dict, ln_pre: str, block: str,
          ln_post: str, proj: str) -> None:
    _ln(out, ln_pre, p["ln_pre"])
    _light_transformer(out, block, p["block"])
    _ln(out, ln_post, p["ln_post"])
    _lin(out, proj, p["proj"])


def trainable_to_reference_state_dict(
    trainable: dict,
) -> Tuple[Dict[str, np.ndarray], str]:
    """Map our trainable pytree to reference state-dict keys.

    Returns (flat numpy state dict, detected trainer family).  The family
    decides the key prefixes (reference learner attribute names) — the same
    signatures the importer keys on, in reverse."""
    sd: Dict[str, np.ndarray] = {}
    if "embed_projection" in trainable:  # MuDPT
        pl = "mudpt_prompt_learner"
        sd[f"{pl}.ctx"] = _t(trainable["ctx"])
        sd[f"{pl}.deep_prompts"] = _t(trainable["deep_prompts"])
        _lin(sd, f"{pl}.embed_projection", trainable["embed_projection"])
        _lin(sd, f"{pl}.deep_projections", trainable["deep_projections"])
        sd["image_encoder.visual_ctx"] = _t(trainable["visual_ctx"])
        sd["image_encoder.visual_ctx_deep_prompts"] = _t(
            trainable["visual_ctx_deep_prompts"]
        )
        _lin(sd, "image_encoder.visual_ctx_deep_projections",
             trainable["visual_ctx_deep_projections"])
        return sd, "MuDPT"
    if "v2t" in trainable:  # UUMuDPT
        pl = "uumudpt_prompt_learner"
        sd[f"{pl}.ctx"] = _t(trainable["ctx"])
        sd[f"{pl}.deep_prompts"] = _t(trainable["deep_prompts"])
        _head(sd, trainable["t2v"], f"{pl}.ln_pre", f"{pl}.self_attn",
              f"{pl}.ln_post", f"{pl}.visual_proj")
        sd["image_encoder.visual_ctx"] = _t(trainable["visual_ctx"])
        sd["image_encoder.visual_ctx_deep_prompts"] = _t(
            trainable["visual_ctx_deep_prompts"]
        )
        _head(sd, trainable["v2t"],
              "image_encoder.visual_ctx_ln_intra_pre",
              "image_encoder.visual_ctx_self_attn",
              "image_encoder.visual_ctx_ln_intra_post",
              "image_encoder.visual_ctx_text_proj")
        return sd, "UUMuDPT"
    if "t2v" in trainable:  # UMuDPT
        pl = "umudpt_prompt_learner"
        sd[f"{pl}.ctx"] = _t(trainable["ctx"])
        sd[f"{pl}.deep_prompts"] = _t(trainable["deep_prompts"])
        _head(sd, trainable["t2v"], f"{pl}.ln_pre", f"{pl}.self_attn",
              f"{pl}.ln_post", f"{pl}.visual_proj")
        return sd, "UMuDPT"
    if "meta_net" in trainable:  # CoCoOp (learner-only checkpoint)
        sd["ctx"] = _t(trainable["ctx"])
        _lin(sd, "meta_net.linear1", trainable["meta_net"]["linear1"])
        _lin(sd, "meta_net.linear2", trainable["meta_net"]["linear2"])
        return sd, "CoCoOp"
    if set(trainable) & {"visual_deep_prompts", "text_deep_prompts"} or (
        "visual_ctx" in trainable
    ):  # VPT/MPT: per-block visual_ctx params on both towers.  Any tree
        # still holding visual_ctx here is VPT/MPT (MuDPT/UUMuDPT matched
        # above) — including MPT depth-1 configs whose only leaves are
        # {ctx, visual_ctx}; those must NOT fall through to the CoOp
        # branch below, which would drop visual_ctx and mis-key ctx
        if "ctx" in trainable:
            # MPT's learnable layer-0 text context — the reference keeps
            # it on the TextPromptLearner under the name visual_ctx
            # (mpt.py:77, the freeze-rule trick)
            sd["text_prompt_learner.visual_ctx"] = _t(trainable["ctx"])
        if "visual_ctx" in trainable:
            sd["image_encoder.visual_ctx"] = _t(trainable["visual_ctx"])
        for tower, key in (("image_encoder", "visual_deep_prompts"),
                           ("text_encoder", "text_deep_prompts")):
            if key in trainable:
                stack = _t(trainable[key])
                for i in range(stack.shape[0]):
                    sd[f"{tower}.transformer.resblocks.{i + 1}.visual_ctx"] = (
                        stack[i]
                    )
        return sd, "VPT/MPT"
    if "ctx" in trainable:  # CoOp (learner-only checkpoint)
        return {"ctx": _t(trainable["ctx"])}, "CoOp"
    raise ValueError(
        "Unrecognized trainable pytree: keys "
        f"{sorted(trainable)} match no reference trainer signature"
    )


def save_reference_checkpoint(path: str, trainable: dict, epoch: int = 0) -> str:
    """Write a reference-loadable torch pickle of the trainable pytree."""
    import torch

    sd, _ = trainable_to_reference_state_dict(trainable)
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()},
         "epoch": int(epoch)},
        path,
    )
    return path
