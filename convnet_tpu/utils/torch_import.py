"""Import PyTorch reference checkpoints into convnet_tpu pytrees.

Replaces the reference's resume/evaluate user journey
(``torch.load(path); model.load_state_dict(ckpt['state_dict'])``,
main.py:~260-290 approx.) for users switching to this framework: a
checkpoint trained with eladhoffer/convNet.pytorch can be loaded into
the equivalent convnet_tpu model and evaluated/fine-tuned/served.

Pairing strategy (no torch module names are assumed):

1. Walk our ``Module`` tree in definition order and collect the
   *parameterized units* — Conv2d, Linear, BatchNorm2d — each with the
   key-path into our (params, state) pytrees.
2. Group the torch ``state_dict`` (registration order) into the same
   unit kinds: a 4-D ``*.weight`` is a conv (+ optional 1-D sibling
   bias), a 2-D ``*.weight`` a linear, a 1-D ``*.weight`` with
   ``running_mean``/``running_var`` siblings a BN
   (``num_batches_tracked`` is ignored).
3. Pair the two unit sequences in order. On a kind mismatch, look
   ahead a small window on the torch side (modules are sometimes
   *registered* at a different point than they are *executed*, e.g. a
   residual downsample) and take the first kind- and shape-compatible
   unit.
4. Verify every shape after layout conversion — conv OIHW→HWIO,
   linear [out,in]→[in,out] — and fail loudly with both names on any
   mismatch or leftover units.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from convnet_tpu.nn.layers import BatchNorm2d, Conv2d, GlobalAvgPool, Linear


# ----------------------------------------------------------------- ours


def _child_params(tree, name):
    """Fetch a child's subtree, tolerating dotted composite names
    (list/dict attributes yield ``attr.key`` child names)."""
    if not isinstance(tree, dict):
        return {}
    if name in tree:
        return tree[name]
    if "." in name:
        node = tree
        for part in name.split("."):
            if not isinstance(node, dict) or part not in node:
                return {}
            node = node[part]
        return node
    return {}


def _name_parts(name):
    return tuple(name.split("."))


def collect_units(module, params, state, prefix=()):
    """Yield (kind, path, unit_dict) in module-definition order.

    ``path`` addresses the unit inside the params tree (tuple of keys);
    BN units also carry the same path into the state tree.
    """
    units = []
    # Whether a GlobalAvgPool was walked since the last conv: a linear
    # after a global pool consumes a spatial-free feature vector, so
    # the NCHW-vs-NHWC flatten permutation must NOT be applied to it
    # (GoogLeNet/DenseNet classifiers follow pool/concat and their
    # in_features deliberately differ from the last conv's channels).
    pooled = [False]

    def walk(mod, p, s, path):
        if isinstance(mod, Conv2d):
            pooled[0] = False
            units.append(("conv", path, {"p": p, "s": s, "mod": mod}))
            return
        if isinstance(mod, Linear):
            units.append(("linear", path,
                          {"p": p, "s": s, "mod": mod,
                           "pooled": pooled[0]}))
            return
        if isinstance(mod, BatchNorm2d):
            units.append(("bn", path, {"p": p, "s": s, "mod": mod}))
            return
        if isinstance(mod, GlobalAvgPool):
            pooled[0] = True
            return
        for name, child in mod.children():
            walk(child, _child_params(p, name), _child_params(s, name),
                 path + _name_parts(name))

    walk(module, params, state, prefix)
    return units


# ---------------------------------------------------------------- torch


def _group_torch_units(state_dict):
    """Group a torch state_dict into (kind, name, tensors) units, in
    registration order."""
    items = [(k, np.asarray(v)) for k, v in state_dict.items()
             if not k.endswith("num_batches_tracked")]
    units = []
    by_prefix = {}
    for key, val in items:
        if "." in key:
            prefix, leaf = key.rsplit(".", 1)
        else:
            prefix, leaf = "", key
        by_prefix.setdefault(prefix, {})[leaf] = val
    # preserve first-seen prefix order
    seen = []
    for key, _ in items:
        prefix = key.rsplit(".", 1)[0] if "." in key else ""
        if prefix not in seen:
            seen.append(prefix)
    for prefix in seen:
        leaves = by_prefix[prefix]
        w = leaves.get("weight")
        if w is not None and w.ndim == 4:
            units.append(("conv", prefix,
                          {"w": w, "b": leaves.get("bias")}))
        elif w is not None and w.ndim == 2:
            units.append(("linear", prefix,
                          {"w": w, "b": leaves.get("bias")}))
        elif "running_mean" in leaves or (w is not None and w.ndim == 1):
            units.append(("bn", prefix, {
                "scale": w, "bias": leaves.get("bias"),
                "mean": leaves.get("running_mean"),
                "var": leaves.get("running_var")}))
        else:  # pragma: no cover - unknown tensor group
            raise ValueError(
                f"unrecognized state_dict entry group '{prefix}': "
                f"{sorted(leaves)} with shapes "
                f"{[v.shape for v in leaves.values()]}")
    return units


# ------------------------------------------------------------- matching


def _conv_shape_ours(t_w):
    return tuple(np.transpose(t_w, (2, 3, 1, 0)).shape)


def _compatible(kind, ours, theirs):
    op, tp = ours[2]["p"], theirs[2]
    if kind == "conv":
        return tuple(op["w"].shape) == _conv_shape_ours(tp["w"])
    if kind == "linear":
        return tuple(op["w"].shape) == tuple(tp["w"].T.shape)
    if kind == "bn":
        ref = tp["mean"] if tp["mean"] is not None else tp["scale"]
        ours_n = (op["scale"].shape if op else
                  ours[2]["s"]["mean"].shape)
        return tuple(ours_n) == tuple(ref.shape)
    return False  # pragma: no cover


def pair_units(our_units, torch_units, lookahead=6):
    """Pair our units with torch units in order, with a bounded
    lookahead on the torch side for registration-order differences.
    Returns list of (our_unit, torch_unit)."""
    remaining = list(torch_units)
    pairs = []
    for ou in our_units:
        kind = ou[0]
        hit = None
        for j, tu in enumerate(remaining[:lookahead]):
            if tu[0] == kind and _compatible(kind, ou, tu):
                hit = j
                break
        if hit is None:
            near = [(t[0], t[1]) for t in remaining[:lookahead]]
            raise ValueError(
                f"no torch unit matches {kind} at path "
                f"{'/'.join(ou[1])} (shape "
                f"{[tuple(np.asarray(v).shape) for v in ou[2]['p'].values()]}); "
                f"next torch units: {near}")
        pairs.append((ou, remaining.pop(hit)))
    if remaining:
        raise ValueError(
            "torch state_dict has unmatched units: "
            + ", ".join(f"{k}:{n}" for k, n, _ in remaining[:8]))
    return pairs


# ------------------------------------------------------------ injection


def _set_path(tree, path, leaf_key, value):
    node = tree
    for part in path:
        node = node[part]
    node[leaf_key] = value


def _cast_like(old, new):
    return jnp.asarray(new, dtype=old.dtype)


def _is_aux_unit_torch(unit):
    return "aux" in unit[1].lower()


def _is_aux_unit_ours(unit):
    return any("aux" in str(p).lower() for p in unit[1])


def _split_aux(units, pred):
    trunk, aux = [], []
    for u in units:
        (aux if pred(u) else trunk).append(u)
    return trunk, aux


def import_torch_state_dict(state_dict, model, params, state):
    """Return (params, state) with every conv/linear/BN leaf replaced
    by the corresponding torch tensor (layouts converted, dtypes
    preserved). Raises ValueError on any structural mismatch.

    Auxiliary-classifier heads (GoogLeNet/Inception-v3 training
    scaffolding; reference models/googlenet.py:~1-200 approx.) are
    paired by NAME, not position: torch registers them mid-trunk while
    our models define them after the classifier, so units whose torch
    prefix / our path contains 'aux' are split out and paired
    separately. A checkpoint carrying aux heads imports into an
    aux-less model by dropping the aux units with a warning (the heads
    are training-only; eval semantics are unchanged)."""
    import copy
    params = copy.deepcopy(params)
    state = copy.deepcopy(state)
    ours = collect_units(model, params, state)
    theirs = _group_torch_units(state_dict)
    ours_trunk, ours_aux = _split_aux(ours, _is_aux_unit_ours)
    theirs_trunk, theirs_aux = _split_aux(theirs, _is_aux_unit_torch)
    if theirs_aux and not ours_aux:
        import warnings
        warnings.warn(
            f"state_dict carries {len(theirs_aux)} auxiliary-head "
            f"units ({sorted({u[1].split('.')[0] for u in theirs_aux})}) "
            f"but the model has no aux classifiers; dropping them "
            f"(training-only heads — eval logits are unaffected). "
            f"Build the model with aux_classifiers=True to import them.")
        theirs_aux = []
    ours = ours_trunk + ours_aux
    theirs = theirs_trunk + theirs_aux
    n_ours = len(ours)
    if n_ours != len(theirs):
        raise ValueError(
            f"unit count mismatch: model has {n_ours} parameterized "
            f"units ({len(ours_aux)} aux), state_dict has "
            f"{len(theirs)} ({len(theirs_aux)} aux)")
    pending_bias = None  # (torch_name, bias) from a bias-less model conv
    last_conv_out = None  # out-channels of the most recent conv unit
    for ou, tu in pair_units(ours, theirs):
        kind, path, u = ou
        tp = tu[2]
        if pending_bias is not None and kind != "bn":
            raise ValueError(
                f"torch conv '{pending_bias[0]}' has a bias, model conv "
                f"has none, and the next unit is not a BatchNorm to "
                f"fold it into")
        if kind == "conv":
            last_conv_out = int(np.asarray(tp["w"]).shape[0])
            _set_path(params, path, "w", _cast_like(
                u["p"]["w"], np.transpose(tp["w"], (2, 3, 1, 0))))
            if tp.get("b") is not None:
                if "b" in u["p"]:
                    _set_path(params, path, "b",
                              _cast_like(u["p"]["b"], tp["b"]))
                else:
                    # conv bias followed by BN folds exactly into the
                    # BN's running mean: BN(conv+b | mean=mu) ==
                    # BN(conv | mean=mu-b)
                    pending_bias = (tu[1], tp["b"])
        elif kind == "linear":
            w = np.asarray(tp["w"])  # (out, in)
            # conv→flatten boundary: torch flattened (C, H, W), our
            # NHWC pipeline flattens (H, W, C) — permute the input
            # rows of the first linear after the conv features. Only
            # applies when the model actually flattens a spatial map;
            # after a GlobalAvgPool the features are spatial-free and
            # a plain transpose is correct even when in_features
            # differ from the last conv's channels (concat heads).
            if (last_conv_out and not u.get("pooled")
                    and w.shape[1] != last_conv_out):
                if w.shape[1] % last_conv_out:
                    raise ValueError(
                        f"linear '{tu[1]}' in_features {w.shape[1]} "
                        f"is not a multiple of the preceding conv's "
                        f"{last_conv_out} channels")
                spatial = w.shape[1] // last_conv_out
                side = int(round(spatial ** 0.5))
                if side * side != spatial:
                    raise ValueError(
                        f"linear '{tu[1]}': cannot infer square "
                        f"spatial size from {spatial}")
                w = (w.reshape(w.shape[0], last_conv_out, side, side)
                     .transpose(0, 2, 3, 1).reshape(w.shape[0], -1))
            last_conv_out = None
            _set_path(params, path, "w", _cast_like(u["p"]["w"], w.T))
            if tp.get("b") is not None:
                if "b" not in u["p"]:
                    raise ValueError(
                        f"torch linear '{tu[1]}' has a bias but the "
                        f"model linear at {'/'.join(path)} was built "
                        f"without one")
                _set_path(params, path, "b", _cast_like(u["p"]["b"], tp["b"]))
        else:  # bn
            if u["p"]:
                _set_path(params, path, "scale",
                          _cast_like(u["p"]["scale"], tp["scale"]))
                _set_path(params, path, "bias",
                          _cast_like(u["p"]["bias"], tp["bias"]))
            if tp.get("mean") is not None:
                mean = np.asarray(tp["mean"])
                if pending_bias is not None:
                    if pending_bias[1].shape != mean.shape:
                        raise ValueError(
                            f"cannot fold bias of torch conv "
                            f"'{pending_bias[0]}' (shape "
                            f"{pending_bias[1].shape}) into BN "
                            f"'{tu[1]}' (features {mean.shape})")
                    mean = mean - pending_bias[1]
                    pending_bias = None
                _set_path(state, path, "mean",
                          _cast_like(u["s"]["mean"], mean))
                _set_path(state, path, "var",
                          _cast_like(u["s"]["var"], tp["var"]))
            elif pending_bias is not None:
                raise ValueError(
                    f"torch conv '{pending_bias[0]}' bias needs BN "
                    f"running stats to fold into, but BN '{tu[1]}' "
                    f"has none")
    if pending_bias is not None:
        raise ValueError(
            f"torch conv '{pending_bias[0]}' has a bias with no "
            f"following BN to fold it into")
    return params, state


def export_into_torch_state_dict(template_state_dict, model, params, state):
    """Inverse of :func:`import_torch_state_dict`: fill a torch
    state_dict *template* (e.g. ``reference_model.state_dict()``) with
    this model's weights, converting layouts back (HWIO→OIHW,
    linear transpose, NHWC→NCHW flatten order). Returns a new dict of
    numpy arrays keyed like the template — load it with
    ``reference_model.load_state_dict({k: torch.tensor(v) ...})``.

    Covers the deploy-back journey: train on TPU here, serve with the
    PyTorch reference stack. Conv biases in the template cannot be
    reconstructed (ours are bias-free, folded into BN) and are emitted
    as zeros with the BN mean adjusted — numerically equivalent."""
    ours = collect_units(model, params, state)
    theirs = _group_torch_units(template_state_dict)
    # pair aux heads by name, as in import_torch_state_dict
    ours_trunk, ours_aux = _split_aux(ours, _is_aux_unit_ours)
    theirs_trunk, theirs_aux = _split_aux(theirs, _is_aux_unit_torch)
    ours = ours_trunk + ours_aux
    theirs = theirs_trunk + theirs_aux
    if len(ours) != len(theirs):
        raise ValueError(
            f"unit count mismatch: model has {len(ours)} parameterized "
            f"units, template has {len(theirs)}")
    out = {k: np.asarray(v) for k, v in template_state_dict.items()}
    last_conv_out = None
    for ou, tu in pair_units(ours, theirs):
        kind, path, u = ou
        prefix = tu[1]
        key = (lambda leaf: f"{prefix}.{leaf}" if prefix else leaf)
        if kind == "conv":
            w = np.asarray(u["p"]["w"], np.float32)  # HWIO
            last_conv_out = w.shape[3]
            out[key("weight")] = np.transpose(w, (3, 2, 0, 1))
            if tu[2].get("b") is not None:
                out[key("bias")] = (
                    np.asarray(u["p"]["b"], np.float32) if "b" in u["p"]
                    else np.zeros(w.shape[3], np.float32))
        elif kind == "linear":
            w = np.asarray(u["p"]["w"], np.float32).T  # (out, in)
            if (last_conv_out and not u.get("pooled")
                    and w.shape[1] != last_conv_out):
                spatial = w.shape[1] // last_conv_out
                side = int(round(spatial ** 0.5))
                # ours is flattened (H, W, C); template wants (C, H, W)
                w = (w.reshape(w.shape[0], side, side, last_conv_out)
                     .transpose(0, 3, 1, 2).reshape(w.shape[0], -1))
            last_conv_out = None
            out[key("weight")] = w
            if tu[2].get("b") is not None and "b" in u["p"]:
                out[key("bias")] = np.asarray(u["p"]["b"], np.float32)
        else:  # bn
            if u["p"]:
                out[key("weight")] = np.asarray(u["p"]["scale"], np.float32)
                out[key("bias")] = np.asarray(u["p"]["bias"], np.float32)
            if tu[2].get("mean") is not None:
                out[key("running_mean")] = np.asarray(u["s"]["mean"],
                                                     np.float32)
                out[key("running_var")] = np.asarray(u["s"]["var"],
                                                    np.float32)
    return out


def load_torch_checkpoint(path, model, params, state):
    """Load a reference checkpoint file (``checkpoint.pth.tar`` /
    ``model_best.pth.tar`` — a pickled dict with a ``state_dict`` key —
    or a bare state_dict) into (params, state). Returns
    (params, state, meta) where meta carries epoch/best_prec1 when
    present."""
    import torch
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        meta = {k: v for k, v in ckpt.items() if k != "state_dict"}
    else:
        sd, meta = ckpt, {}
    # DataParallel/DDP checkpoints prefix every key with 'module.'
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    params, state = import_torch_state_dict(sd, model, params, state)
    return params, state, meta
