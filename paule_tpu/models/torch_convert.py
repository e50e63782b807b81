"""Convert reference (torch) checkpoints into paule_tpu parameter pytrees.

The reference distributes ~200 MB of pretrained torch ``state_dict``s
(/root/reference/paule/util.py:936-956; loaded at
/root/reference/paule/paule.py:124-273).  These functions map those
state_dicts onto our parameter layouts:

* linear:   torch ``weight (out, in)``      -> ``w (in, out)`` (transpose)
* conv1d:   torch ``weight (out, in/g, k)`` -> ``w (k, in/g, out)``
* LSTM:     torch ``weight_ih_l{i} (4H, in)`` -> ``w_ih (in, 4H)``;
            biases summed into one ``b (4H,)``; gate order (i,f,g,o) is
            shared so no permutation is needed.

Loading a ``.pt`` file requires torch; conversion itself is pure numpy.
"""

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def t_linear(sd, prefix):
    return {"w": _np(sd[f"{prefix}.weight"]).T.copy(),
            "b": _np(sd[f"{prefix}.bias"]).copy()}


def t_conv1d(sd, prefix):
    return {"w": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 1, 0)).copy(),
            "b": _np(sd[f"{prefix}.bias"]).copy()}


def t_lstm(sd, prefix, num_layers):
    layers = []
    for li in range(num_layers):
        layers.append({
            "w_ih": _np(sd[f"{prefix}.weight_ih_l{li}"]).T.copy(),
            "w_hh": _np(sd[f"{prefix}.weight_hh_l{li}"]).T.copy(),
            "b": (_np(sd[f"{prefix}.bias_ih_l{li}"])
                  + _np(sd[f"{prefix}.bias_hh_l{li}"])).copy(),
        })
    return layers


def t_batchnorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]).copy(),
            "bias": _np(sd[f"{prefix}.bias"]).copy(),
            "mean": _np(sd[f"{prefix}.running_mean"]).copy(),
            "var": _np(sd[f"{prefix}.running_var"]).copy()}


def t_instancenorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]).copy(),
            "bias": _np(sd[f"{prefix}.bias"]).copy()}


def _count(sd, pattern):
    n = 0
    while any(k.startswith(pattern.format(n)) for k in sd):
        n += 1
    return n


def convert_forward_model(sd):
    num_layers = _count(sd, "lstm.weight_ih_l{}")
    return {"lstm": t_lstm(sd, "lstm", num_layers),
            "post_linear": t_linear(sd, "post_linear")}


def convert_embedding_model(sd):
    num_layers = _count(sd, "lstm.weight_ih_l{}")
    params = {"lstm": t_lstm(sd, "lstm", num_layers),
              "linear_mapping": t_linear(sd, "linear_mapping")}
    if "post_linear.weight" in sd:
        params["post_linear"] = t_linear(sd, "post_linear")
    return params


def convert_inverse_model(sd):
    num_layers = _count(sd, "lstm.weight_ih_l{}")
    n_mel = _count(sd, "MelBlocks.{}.")
    n_res = _count(sd, "ResidualConvBlocks.{}.")
    params = {
        "mel_blocks": [
            {"convs": [
                t_conv1d(sd, f"MelBlocks.{i}.ConvLayers.{j}")
                for j in range(_count(sd, f"MelBlocks.{i}.ConvLayers.{{}}."))
            ]}
            for i in range(n_mel)
        ],
        "lstm": t_lstm(sd, "lstm", num_layers),
        "post_linear": t_linear(sd, "post_linear"),
        "resid_blocks": [
            {"conv1": t_conv1d(sd, f"ResidualConvBlocks.{i}.band_conv1d_1"),
             "conv2": t_conv1d(sd, f"ResidualConvBlocks.{i}.band_conv1d_2")}
            for i in range(n_res)
        ],
    }
    if "resid_weighting.weight" in sd:
        params["resid_weighting"] = t_conv1d(sd, "resid_weighting")
    return params


def convert_generator(sd):
    n_blocks = _count(sd, "res_blocks.{}.")
    return {
        "fully_connected": t_linear(sd, "fully_connected"),
        "blocks": [
            {"conv": t_conv1d(sd, f"res_blocks.{i}.0"),
             "bn": t_batchnorm(sd, f"res_blocks.{i}.1")}
            for i in range(n_blocks)
        ],
        "post_linear": t_linear(sd, "post_linear"),
        "final_smoothing": t_conv1d(sd, "final_smoothing"),
    }


def convert_critic(sd):
    n_blocks = _count(sd, "res_blocks.{}.")
    return {
        "inital_linear": t_linear(sd, "inital_linear"),
        "blocks": [
            {"conv": t_conv1d(sd, f"res_blocks.{i}.0"),
             "in_norm": t_instancenorm(sd, f"res_blocks.{i}.1")}
            for i in range(n_blocks)
        ],
    }


def convert_linear_classifier(sd):
    return {"linear": t_linear(sd, "linear")}


def load_state_dict(path):
    """Load a torch .pt state_dict from disk (requires torch)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


#: registry: pretrained-model kind -> converter
CONVERTERS = {
    "forward": convert_forward_model,
    "inverse": convert_inverse_model,
    "embedder": convert_embedding_model,
    "generator": convert_generator,
    "critic": convert_critic,
    "linear_classifier": convert_linear_classifier,
}


def convert(kind, state_dict_or_path):
    sd = state_dict_or_path
    if isinstance(sd, (str, bytes)):
        sd = load_state_dict(sd)
    return CONVERTERS[kind](sd)
