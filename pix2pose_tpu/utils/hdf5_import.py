"""Import reference Keras HDF5 weights into the Flax models.

The reference ships per-object generator weights as Keras ``save_weights``
HDF5 (``inference.hdf5``; layer names at ``pix2pose_model/ae_model.py``:
named convs ``conv1_1..conv4_2``, ``deconv1-3``, ``disc_conv2d_*``, plus
auto-named ``batch_normalization_N`` / ``dense_N`` / ``conv2d_transpose_N``
in graph-construction order). This module maps that layout onto the Flax
module tree so reference-trained weights run on TPU unchanged.

Weight-layout conversions:
- Conv2D kernel (kh, kw, in, out) -> identical in flax.
- Dense (in, out) -> identical.
- Conv2DTranspose: Keras stores (kh, kw, OUT, IN) and computes the
  *gradient-of-conv* (input-scattered correlation with the un-flipped
  kernel). flax ``nn.ConvTranspose`` computes a fractionally-strided
  convolution with an (kh, kw, IN, OUT) kernel — numerically equal after
  spatial flip + axis swap (validated in tests/test_hdf5_import.py against
  a direct numpy reference).
- BatchNorm gamma/beta/moving_mean/moving_variance ->
  scale/bias + batch_stats (keras eps 1e-3 is already baked into the
  models).
"""

from __future__ import annotations

import numpy as np


def _kernel_ct(k):
    """Keras Conv2DTranspose kernel -> flax ConvTranspose kernel."""
    return np.ascontiguousarray(k[::-1, ::-1].transpose(0, 1, 3, 2))


def _read_layer(f, name):
    """Return {weight_name: array} for a layer in a save_weights file."""
    import h5py  # noqa: F401

    grp = f
    if "model_weights" in f:
        grp = f["model_weights"]
    if name not in grp:
        return None
    layer = grp[name]
    out = {}

    def visit(key, obj):
        import h5py

        if isinstance(obj, h5py.Dataset):
            out[key.split("/")[-1].split(":")[0]] = np.asarray(obj)

    layer.visititems(visit)
    return out


# graph-construction order of auto-named layers in aemodel_unet_prob
# (``ae_model.py:70-150``): BN after every conv/deconv, two dense layers,
# five transposed convs.
_PAPER_ENCODER = [  # (keras conv name, flax module path)
    ("conv1_1", ("encoder", "e1_1")), ("conv1_2", ("encoder", "e1_2")),
    ("conv2_1", ("encoder", "e2_1")), ("conv2_2", ("encoder", "e2_2")),
    ("conv3_1", ("encoder", "e3_1")), ("conv3_2", ("encoder", "e3_2")),
    ("conv4_1", ("encoder", "e4_1")), ("conv4_2", ("encoder", "e4_2")),
]
_DECODER_CONVS = [("deconv1", ("d1_uni",)), ("deconv2", ("d2_uni",)),
                  ("deconv3", ("d3_uni",))]
# BN auto-name indices follow keras graph order: 8 encoder BNs then the
# decoder ones interleaved with deconvs
_PAPER_BN_ORDER = [
    ("encoder", "e1_1"), ("encoder", "e1_2"),
    ("encoder", "e2_1"), ("encoder", "e2_2"),
    ("encoder", "e3_1"), ("encoder", "e3_2"),
    ("encoder", "e4_1"), ("encoder", "e4_2"),
    ("d1",), ("d1_uni",), ("d2",), ("d2_uni",), ("d3",), ("d3_uni",),
]
_CT_ORDER = [("d1",), ("d2",), ("d3",), ("head_xyz",), ("head_prob",)]


def _set(tree, path, leaf_name, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


# keras ResNet50 block names (stage, block-letter, keras res-id) for the
# BOP'20 encoder (stages 2-3 only; reference resnet50_mod.py:214-231)
_RESNET_BLOCKS = [
    ("s2_b0", "2a", True), ("s2_b1", "2b", False), ("s2_b2", "2c", False),
    ("s3_b0", "3a", True), ("s3_b1", "3b", False), ("s3_b2", "3c", False),
    ("s3_b3", "3d", False),
]
_RESNET_BN_ORDER = [  # decoder auto-named BNs for the resnet50 generator
    ("encoder", "e4_1"), ("encoder", "e4_2"),
    ("d1",), ("d1_uni",), ("d2",), ("d2_uni",), ("d3",), ("d3_uni",),
]


def load_keras_generator(h5_path: str, model=None, bn_offset: int = 0,
                         dense_offset: int = 0, ct_offset: int = 0):
    """Load a paper-backbone generator ``inference.hdf5`` into flax
    variables {'params', 'batch_stats'}.

    The ``*_offset`` arguments shift keras auto-name numbering, which keeps
    counting across models built earlier in the same process (the reference
    evaluator builds one graph per object, ``5_evaluation_bop_basic.py:
    206-225``); offsets are auto-probed when the default names are absent.
    """
    import h5py

    with h5py.File(h5_path, "r") as f:
        # probe auto-name offsets
        def probe(prefix):
            # top-level layer groups only — nested same-name weight groups
            # keep the ORIGINAL layer name in keras files, so recursing
            # would defeat the renumbering probe
            grp = f["model_weights"] if "model_weights" in f else f
            names = set(grp.keys())
            idx = [int(n[len(prefix) + 1:]) for n in names
                   if n.startswith(prefix + "_")
                   and n[len(prefix) + 1:].isdigit()]
            return min(idx) - 1 if idx else 0

        bn_offset = bn_offset or probe("batch_normalization")
        dense_offset = dense_offset or probe("dense")
        ct_offset = ct_offset or probe("conv2d_transpose")

        params: dict = {}
        stats: dict = {}

        def conv(keras_name, path, transpose=False):
            w = _read_layer(f, keras_name)
            if w is None:
                raise KeyError(f"{keras_name} not in {h5_path}")
            kernel = _kernel_ct(w["kernel"]) if transpose else w["kernel"]
            _set(params, path, "kernel", kernel)
            if "bias" in w:
                _set(params, path, "bias", w["bias"])

        def bn(keras_name, path):
            w = _read_layer(f, keras_name)
            if w is None:
                raise KeyError(f"{keras_name} not in {h5_path}")
            _set(params, path, "scale", w["gamma"])
            _set(params, path, "bias", w["beta"])
            _set(stats, path, "mean", w["moving_mean"])
            _set(stats, path, "var", w["moving_variance"])

        for name, path in _PAPER_ENCODER:
            conv(name, path + ("conv",))
        for name, path in _DECODER_CONVS:
            conv(name, path + ("conv",))
        for i, path in enumerate(_PAPER_BN_ORDER):
            bn(f"batch_normalization_{bn_offset + i + 1}", path + ("bn",))
        conv(f"dense_{dense_offset + 1}", ("fc_enc",))
        conv(f"dense_{dense_offset + 2}", ("fc_dec",))
        for i, path in enumerate(_CT_ORDER):
            leaf = ("deconv",) if len(path) == 1 and path[0].startswith(
                "d") and not path[0].startswith("head") else ()
            conv(f"conv2d_transpose_{ct_offset + i + 1}", path + leaf,
                 transpose=True)

    variables = {"params": params, "batch_stats": stats}
    if model is not None:
        _check_shapes(model, variables)
    return variables


def load_keras_generator_resnet50(h5_path: str, model=None,
                                  bn_offset: int = 0, dense_offset: int = 0,
                                  ct_offset: int = 0):
    """Load a resnet50-backbone generator HDF5
    (``inference_resnet_model.hdf5`` / ``inference_resnet50.hdf5``) into
    flax variables. Keras resnet layers are NAMED (conv1, bn2a_branch2a,
    res2a_branch1, ...); only the decoder uses auto-numbered names."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        def probe(prefix):
            grp = f["model_weights"] if "model_weights" in f else f
            names = set(grp.keys())
            idx = [int(n[len(prefix) + 1:]) for n in names
                   if n.startswith(prefix + "_")
                   and n[len(prefix) + 1:].isdigit()]
            return min(idx) - 1 if idx else 0

        bn_offset = bn_offset or probe("batch_normalization")
        dense_offset = dense_offset or probe("dense")
        ct_offset = ct_offset or probe("conv2d_transpose")

        params: dict = {}
        stats: dict = {}

        def conv(keras_name, path, transpose=False):
            w = _read_layer(f, keras_name)
            if w is None:
                raise KeyError(f"{keras_name} not in {h5_path}")
            kernel = _kernel_ct(w["kernel"]) if transpose else w["kernel"]
            _set(params, path, "kernel", kernel)
            if "bias" in w:
                _set(params, path, "bias", w["bias"])

        def bn(keras_name, path):
            w = _read_layer(f, keras_name)
            if w is None:
                raise KeyError(f"{keras_name} not in {h5_path}")
            _set(params, path, "scale", w["gamma"])
            _set(params, path, "bias", w["beta"])
            _set(stats, path, "mean", w["moving_mean"])
            _set(stats, path, "var", w["moving_variance"])

        trunk = ("encoder", "trunk")
        conv("conv1", trunk + ("stem_conv",))
        bn("bn_conv1", trunk + ("stem_bn",))
        for mod, rid, has_proj in _RESNET_BLOCKS:
            base = trunk + (mod,)
            for br, sub in (("2a", "conv_a"), ("2b", "conv_b"),
                            ("2c", "conv_c")):
                conv(f"res{rid}_branch{br}", base + (sub,))
                bn(f"bn{rid}_branch{br}",
                   base + ({"2a": "bn_a", "2b": "bn_b",
                            "2c": "bn_c"}[br],))
            if has_proj:
                conv(f"res{rid}_branch1", base + ("proj_conv",))
                bn(f"bn{rid}_branch1", base + ("proj_bn",))
        conv("conv4_1", ("encoder", "e4_1", "conv"))
        conv("conv4_2", ("encoder", "e4_2", "conv"))
        for name, path in _DECODER_CONVS:
            conv(name, path + ("conv",))
        for i, path in enumerate(_RESNET_BN_ORDER):
            bn(f"batch_normalization_{bn_offset + i + 1}", path + ("bn",))
        conv(f"dense_{dense_offset + 1}", ("fc_enc",))
        conv(f"dense_{dense_offset + 2}", ("fc_dec",))
        for i, path in enumerate(_CT_ORDER):
            leaf = ("deconv",) if len(path) == 1 and path[0].startswith(
                "d") and not path[0].startswith("head") else ()
            conv(f"conv2d_transpose_{ct_offset + i + 1}", path + leaf,
                 transpose=True)

    variables = {"params": params, "batch_stats": stats}
    if model is not None:
        _check_shapes(model, variables)
    return variables


def _normalize_weight_names(w: dict) -> dict:
    """Map keras-applications dataset-name variants onto the canonical
    kernel/bias/gamma/beta/moving_mean/moving_variance names (older files
    use layer-prefixed names like ``conv1_W:0`` / ``bn2a_branch2a_gamma``)."""
    out = {}
    for k, v in w.items():
        kk = k
        if kk not in ("kernel", "bias", "gamma", "beta", "moving_mean",
                      "moving_variance"):
            if kk.endswith("_W") or kk == "W":
                kk = "kernel"
            elif kk.endswith("_b") or kk == "b":
                kk = "bias"
            elif kk.endswith("gamma"):
                kk = "gamma"
            elif kk.endswith("beta"):
                kk = "beta"
            elif kk.endswith("running_mean") or kk.endswith("mean"):
                kk = "moving_mean"
            elif (kk.endswith("running_std") or kk.endswith("variance")
                  or kk.endswith("var")):
                kk = "moving_variance"
        out[kk] = v
    return out


def load_imagenet_resnet50_trunk(h5_path: str) -> dict:
    """Load the keras-applications ImageNet ``notop`` ResNet-50 file
    (``resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5``) into the
    :class:`ResNet50Trunk` variable tree — the reference's pretrained
    encoder initialization (``resnet50_mod.py:246-258``). Stages 4/5 in
    the file are ignored (the BOP'20 encoder taps stop at stage 3).

    Returns trunk-rooted ``{'params': ..., 'batch_stats': ...}``; merge
    into a freshly-initialized generator with
    :func:`init_generator_trunk_from_imagenet`.
    """
    import h5py

    params: dict = {}
    stats: dict = {}
    with h5py.File(h5_path, "r") as f:
        def conv(keras_name, path):
            w = _read_layer(f, keras_name)
            if w is None:
                raise KeyError(f"{keras_name} not in {h5_path}")
            w = _normalize_weight_names(w)
            _set(params, path, "kernel", w["kernel"])
            if "bias" in w:
                _set(params, path, "bias", w["bias"])

        def bn(keras_name, path):
            w = _read_layer(f, keras_name)
            if w is None:
                raise KeyError(f"{keras_name} not in {h5_path}")
            w = _normalize_weight_names(w)
            _set(params, path, "scale", w["gamma"])
            _set(params, path, "bias", w["beta"])
            _set(stats, path, "mean", w["moving_mean"])
            _set(stats, path, "var", w["moving_variance"])

        conv("conv1", ("stem_conv",))
        bn("bn_conv1", ("stem_bn",))
        for mod, rid, has_proj in _RESNET_BLOCKS:
            for br, sub in (("2a", "conv_a"), ("2b", "conv_b"),
                            ("2c", "conv_c")):
                conv(f"res{rid}_branch{br}", (mod, sub))
                bn(f"bn{rid}_branch{br}",
                   (mod, {"2a": "bn_a", "2b": "bn_b", "2c": "bn_c"}[br]))
            if has_proj:
                conv(f"res{rid}_branch1", (mod, "proj_conv"))
                bn(f"bn{rid}_branch1", (mod, "proj_bn"))
    return {"params": params, "batch_stats": stats}


def init_generator_trunk_from_imagenet(variables: dict,
                                       h5_path: str) -> dict:
    """Replace the ``encoder/trunk`` subtree of freshly-initialized
    resnet50-backbone generator variables with ImageNet weights. Every
    trunk leaf must be covered (shape-checked); other leaves untouched."""
    import jax

    trunk = load_imagenet_resnet50_trunk(h5_path)
    out = jax.tree_util.tree_map(lambda x: x, variables)  # deep-ish copy
    for col in ("params", "batch_stats"):
        ref = out[col]["encoder"]["trunk"]
        got = trunk[col]
        ref_leaves = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
        got_leaves = dict(jax.tree_util.tree_flatten_with_path(got)[0])
        missing = set(map(str, ref_leaves)) - set(map(str, got_leaves))
        if missing:
            raise ValueError(
                f"imagenet import missing trunk {col}: {sorted(missing)}")
        for k, v in ref_leaves.items():
            g = got_leaves[k]
            if tuple(g.shape) != tuple(v.shape):
                raise ValueError(f"imagenet trunk shape mismatch at {k}: "
                                 f"{g.shape} != {v.shape}")
        out[col]["encoder"]["trunk"] = got
    return out


def _check_shapes(model, variables):
    import jax
    import jax.numpy as jnp

    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3))))
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
    flat_got = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    missing = set(map(str, flat_ref)) - set(map(str, flat_got))
    if missing:
        raise ValueError(f"hdf5 import missing params: {sorted(missing)}")
    for k, v in flat_ref.items():
        got = flat_got.get(k)
        if got is not None and tuple(got.shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch at {k}: {got.shape} != {v.shape}")
