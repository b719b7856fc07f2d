"""Structural audit: every parameterized layer in the reference prototxts
must be accounted for in caffe_net's variant specs (as a parameter, or as
a documented structural equivalent)."""
import os
import re

import pytest

from ideepcolor_tpu.models import caffe_net

PROTOS = {
    "main": "/root/reference/models/reference_model/deploy_nodist.prototxt",
    "dist": "/root/reference/models/reference_model/deploy_nopred.prototxt",
    "global": "/root/reference/models/global_model/deploy_nodist.prototxt",
}


def _parse_layers(path):
    txt = "\n".join(l.split('#')[0] for l in open(path).read().split("\n"))
    layers, i = [], 0
    while True:
        m = re.search(r'layer\s*\{', txt[i:])
        if not m:
            break
        start = i + m.end()
        depth, j = 1, start
        while depth and j < len(txt):
            depth += {'{': 1, '}': -1}.get(txt[j], 0)
            j += 1
        body = txt[start:j - 1]
        t = re.search(r'type:\s*"?(\w+)"?', body)
        n = re.search(r'name:\s*"([\w]+)"', body)
        layers.append((n.group(1) if n else '?', t.group(1) if t else '?'))
        i = j
    return layers


@pytest.mark.parametrize("variant", ["main", "dist", "global"])
def test_every_prototxt_param_layer_is_covered(variant):
    proto = PROTOS[variant]
    if not os.path.exists(proto):
        pytest.skip("reference prototxt unavailable")
    layers = _parse_layers(proto)
    by_type = {}
    for n, t in layers:
        by_type.setdefault(t, []).append(n)

    proto_param = (set(by_type.get("Convolution", []))
                   | set(by_type.get("Deconvolution", [])))
    # structural equivalents: '_ss' stride-2 slices, '_us'/'_rs' fixed
    # bilinear upsamplers; the dist head's pred_ab 1x1 conv is the
    # pts_in_hull einsum (injected weights, ref colorize_image.py:405-407)
    structural = {n for n in proto_param
                  if n.endswith(("_ss", "_us", "_rs"))}
    if variant == "dist":
        structural.add("pred_ab")

    ours = {c[0] for c in caffe_net._convs_for(variant)}
    assert proto_param - structural - ours == set()
    assert ours - proto_param == set()

    ours_bn = set(caffe_net._bns_for(variant))
    proto_bn = set(by_type.get("BatchNorm", []))
    assert proto_bn == ours_bn

    # Scale layers: pred_ab (regression) / scale_S+scale_T (dist)
    for s in by_type.get("Scale", []):
        if s in ("pred_ab", "scale_S", "scale_T"):
            key = f"{s}.scale"
            params = caffe_net.init_params(
                __import__("jax").random.key(0), variant)
            assert key in params, key
