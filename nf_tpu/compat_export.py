"""Export nf_tpu models to reference (normflows) ``state_dict`` format —
the reverse of :mod:`nf_tpu.compat`.

Use case: train on TPU here, then hand the weights to existing torch-side
tooling (eval notebooks, deployment paths built on the reference). The
output maps dotted reference names to numpy arrays;
``torch.nn.Module.load_state_dict`` accepts it after tensor-wrapping:

    sd = nf_tpu.compat_export.export_state_dict(model)
    ref_model.load_state_dict({k: torch.from_numpy(np.array(v))
                               for k, v in sd.items()})

Coverage mirrors the importer for the families with round-trip tests:
containers (incl. MultiscaleFlow), RealNVP layers, the NSF stack, MAF,
Glow, and the trainable bases. Reference bookkeeping buffers that do not
affect compute are emitted at their canonical post-training values
(``data_dep_init_done=1``, ``eye=I``) or zeros (MADE ``degrees`` — used
only at torch-side construction, never in ``forward``; InducedNorm
``scale``/moment stats — recomputed by the next power iteration).

Our ``Scanned`` stacks and their grouping ``Composite``s are flattened
back to the reference's flat ``ModuleList`` indices, so a ``scan=True``
model exports to the same key layout a reference-built model produces.
"""

from __future__ import annotations

import jax
import numpy as np

from . import core
from .distributions import base as dist_base
from .flows import (
    ActNorm,
    AffineConstFlow,
    AffineCoupling,
    AffineCouplingBlock,
    CCAffineConst,
    Composite,
    Invertible1x1Conv,
    InvertibleAffine,
    LULinear,
    LULinearPermute,
    MaskedAffineFlow,
    Merge,
    Permute,
    Planar,
    Radial,
    Reverse,
    Scanned,
    Split,
)
from .flows.autoregressive import Autoregressive
from .flows.mixing import _Permutation
from .flows.neural_spline.coupling import (
    Coupling,
    PiecewiseRationalQuadraticCDF,
)
from .flows.neural_spline.wrapper import (
    AutoregressiveRationalQuadraticSpline,
    CircularAutoregressiveRationalQuadraticSpline,
    CircularCoupledRationalQuadraticSpline,
    CoupledRationalQuadraticSpline,
)
from .nets.cnn import Conv2d, ConvNet2d
from .nets.made import (
    MADE,
    MaskedFeedforwardBlock,
    MaskedLinear,
    MaskedResidualBlock,
)
from .nets.mlp import MLP, Linear
from .nets.precision import MixedPrecision
from .nets.resnet import ConvResidualNet, ResidualBlock, ResidualNet


def _np(a):
    return np.asarray(a)


def _e_linear(mod, out, p):
    out[p + "weight"] = _np(mod.weight)
    if mod.bias is not None:
        out[p + "bias"] = _np(mod.bias)


def _e_masked_linear(mod, out, p):
    _e_linear(mod, out, p)
    out[p + "mask"] = _np(mod.mask)
    # degrees are construction-time metadata in the reference (never read
    # in forward); the mask is the operative buffer
    out[p + "degrees"] = np.zeros(mod.weight.shape[0], np.float32)


def _e_mlp(mod, out, p):
    # reference MLP: Linear at Sequential indices 0, 2, 4, ...; a dropout
    # layer is inserted BEFORE the final Linear (ref nets/mlp.py:34-36),
    # shifting it to an odd index — mirror that
    last = len(mod.linears) - 1
    for i, l in enumerate(mod.linears):
        idx = 2 * i + (1 if mod.dropout is not None and i == last else 0)
        _e_linear(l, out, f"{p}net.{idx}.")


def _e_convnet2d(mod, out, p):
    if mod.actnorms is not None:
        raise NotImplementedError(
            "exporting ConvNet2d with net-ActNorms is not supported")
    for i, c in enumerate(mod.convs):
        _e_linear(c, out, f"{p}net.{2 * i}.")


def _e_residual_block(mod, out, p):
    if mod.batch_norms is not None:
        raise NotImplementedError("batch_norm ResidualNets not supported")
    for i, l in enumerate(mod.linears):
        _e_linear(l, out, f"{p}linear_layers.{i}.")
    if mod.context_layer is not None:
        _e_linear(mod.context_layer, out, p + "context_layer.")


def _head_to_feature_major(arr, head):
    """Inverse of ``compat._head_to_bin_major``: our bin-major head rows
    (row = p*D + d) back to the reference's feature-major layout
    (row = d*mult + p)."""
    if arr is None:
        return None
    d, mult = head
    a = _np(arr)
    return a.reshape((mult, d) + a.shape[1:]).swapaxes(0, 1) \
        .reshape(a.shape)


def _e_residual_net(mod, out, p):
    _e_linear(mod.initial_layer, out, p + "initial_layer.")
    for i, b in enumerate(mod.blocks):
        _e_residual_block(b, out, f"{p}blocks.{i}.")
    final = mod.final_layer
    if mod.bin_major_head is not None:
        final = final.replace(
            weight=_head_to_feature_major(final.weight, mod.bin_major_head),
            bias=_head_to_feature_major(final.bias, mod.bin_major_head))
    _e_linear(final, out, p + "final_layer.")


def _e_conv_residual_block(mod, out, p):
    if mod.batch_norms is not None:
        raise NotImplementedError("batch_norm ConvResidualNets unsupported")
    for i, c in enumerate(mod.convs):
        _e_linear(c, out, f"{p}conv_layers.{i}.")
    if mod.context_layer is not None:
        _e_linear(mod.context_layer, out, p + "context_layer.")


def _e_conv_residual_net(mod, out, p):
    _e_linear(mod.initial_layer, out, p + "initial_layer.")
    for i, b in enumerate(mod.blocks):
        _e_conv_residual_block(b, out, f"{p}blocks.{i}.")
    _e_linear(mod.final_layer, out, p + "final_layer.")


def _e_made(mod, out, p):
    _e_masked_linear(mod.initial_layer, out, p + "initial_layer.")
    if mod.context_layer is not None:
        _e_linear(mod.context_layer, out, p + "context_layer.")
    for i, b in enumerate(mod.blocks):
        q = f"{p}blocks.{i}."
        if isinstance(b, MaskedResidualBlock):
            for j, l in enumerate(b.linears):
                _e_masked_linear(l, out, f"{q}linear_layers.{j}.")
            if b.context_layer is not None:
                _e_linear(b.context_layer, out, q + "context_layer.")
        elif isinstance(b, MaskedFeedforwardBlock):
            _e_masked_linear(b.linear, out, q + "linear.")
        else:
            raise NotImplementedError(type(b).__name__)
    final = mod.final_layer
    if mod.bin_major_head is not None:
        final = final.replace(
            weight=_head_to_feature_major(final.weight, mod.bin_major_head),
            bias=_head_to_feature_major(final.bias, mod.bin_major_head),
            mask=_head_to_feature_major(final.mask, mod.bin_major_head))
    _e_masked_linear(final, out, p + "final_layer.")


def _e_affine_const(mod, out, p):
    if mod.s is not None:
        out[p + "s"] = _np(mod.s)
    if mod.t is not None:
        out[p + "t"] = _np(mod.t)
    if isinstance(mod, ActNorm):
        out[p + "data_dep_init_done"] = np.asarray(1.0, np.float32)


def _e_cc_affine_const(mod, out, p):
    out[p + "s"], out[p + "t"] = _np(mod.s), _np(mod.t)
    out[p + "s_cc"], out[p + "t_cc"] = _np(mod.s_cc), _np(mod.t_cc)


def _e_masked_affine(mod, out, p):
    out[p + "b"] = _np(mod.b)
    if mod.s is not None:
        _export(mod.s, out, p + "s.")
    if mod.t is not None:
        _export(mod.t, out, p + "t.")


def _e_lu_conv(mod, out, p):
    if mod.use_lu:
        for name in ("L", "U", "log_S", "P", "sign_S"):
            out[p + name] = _np(getattr(mod, name))
        out[p + "eye"] = np.eye(mod.num_channels, dtype=np.float32)
    else:
        out[p + "W"] = _np(mod.W)


def _e_lu_linear(mod, out, p):
    for name in ("lower_entries", "upper_entries",
                 "unconstrained_upper_diag", "bias"):
        out[p + name] = _np(getattr(mod, name))


def _e_permutation(mod, out, p):
    out[p + "_permutation"] = _np(mod.permutation).astype(np.int64)


def _e_lu_linear_permute(mod, out, p):
    _e_permutation(mod.permutation, out, p + "permutation.")
    _e_lu_linear(mod.linear, out, p + "linear.")


def _e_permute(mod, out, p):
    if mod.perm is not None:
        out[p + "perm"] = _np(mod.perm).astype(np.int64)
        out[p + "inv_perm"] = _np(mod.inv_perm).astype(np.int64)


def _e_rq_cdf(mod, out, p):
    for name in ("unnormalized_widths", "unnormalized_heights",
                 "unnormalized_derivatives"):
        out[p + name] = _np(getattr(mod, name))


def _e_coupling(mod, out, p):
    out[p + "identity_features"] = np.asarray(mod.identity_features,
                                              np.int64)
    out[p + "transform_features"] = np.asarray(mod.transform_features,
                                               np.int64)
    _export(mod.transform_net, out, p + "transform_net.")
    if mod.unconditional_transform is not None:
        _export(mod.unconditional_transform, out,
                p + "unconditional_transform.")


def _e_autoregressive(mod, out, p):
    _export(mod.autoregressive_net, out, p + "autoregressive_net.")


def _e_named(names):
    def emit(mod, out, p):
        for n in names:
            out[p + n] = _np(getattr(mod, n))
    return emit


def _e_diag_gaussian(mod, out, p):
    out[p + "loc"], out[p + "log_scale"] = _np(mod.loc), _np(mod.log_scale)


def _e_glow_base(mod, out, p):
    for name in ("loc", "loc_logs", "log_scale", "log_scale_logs"):
        out[p + name] = _np(getattr(mod, name))
    if mod.loc_cc is not None:
        out[p + "loc_cc"] = _np(mod.loc_cc)
        out[p + "log_scale_cc"] = _np(mod.log_scale_cc)


def _e_flow_seq(flows, out, p):
    cursor = 0
    for f in flows:
        if isinstance(f, Scanned):
            for j in range(f.num_layers):
                layer = jax.tree_util.tree_map(lambda a, j=j: a[j],
                                               f.stacked)
                cursor = _emit_at(layer, out, p, cursor)
        else:
            cursor = _emit_at(f, out, p, cursor)


def _emit_at(layer, out, p, cursor):
    """Emit one logical layer at flat index ``cursor``; plain grouping
    Composites flatten (reverse of the importer's rule)."""
    if type(layer) is Composite:
        for sf in layer.flows:
            cursor = _emit_at(sf, out, p, cursor)
        return cursor
    _export(layer, out, f"{p}{cursor}.")
    return cursor + 1


def _e_container(mod, out, p):
    _export(mod.q0, out, p + "q0.")
    _e_flow_seq(mod.flows, out, p + "flows.")


def _e_multiscale(mod, out, p):
    for i, q in enumerate(mod.q0):
        _export(q, out, f"{p}q0.{i}.")
    for i, fl in enumerate(mod.flows):
        _e_flow_seq(fl, out, f"{p}flows.{i}.")
    for i, m in enumerate(mod.merges):
        _export(m, out, f"{p}merges.{i}.")
    if mod.transform is not None:
        _export(mod.transform, out, p + "transform.")


def _e_composite(mod, out, p):
    _e_flow_seq(mod.flows, out, p + "flows.")


def _e_coupling_block(mod, out, p):
    _export(mod.coupling, out, p + "flows.1.")


def _e_affine_coupling(mod, out, p):
    _export(mod.param_map, out, p + "param_map.")


def _e_none(mod, out, p):
    pass


_EXPORTERS = (
    (core.MultiscaleFlow, _e_multiscale),
    (core.NormalizingFlow, _e_container),
    (core.ConditionalNormalizingFlow, _e_container),
    (core.ClassCondFlow, _e_container),
    (MaskedLinear, _e_masked_linear),
    (Linear, _e_linear),
    (Conv2d, _e_linear),
    (MLP, _e_mlp),
    (ConvNet2d, _e_convnet2d),
    (ResidualNet, _e_residual_net),
    (ConvResidualNet, _e_conv_residual_net),
    (MADE, _e_made),
    (MaskedAffineFlow, _e_masked_affine),
    (ActNorm, _e_affine_const),
    (CCAffineConst, _e_cc_affine_const),
    (AffineConstFlow, _e_affine_const),
    (Invertible1x1Conv, _e_lu_conv),
    (InvertibleAffine, _e_lu_conv),
    (LULinearPermute, _e_lu_linear_permute),
    (LULinear, _e_lu_linear),
    (_Permutation, _e_permutation),
    (Permute, _e_permute),
    (AffineCouplingBlock, _e_coupling_block),
    (AffineCoupling, _e_affine_coupling),
    (PiecewiseRationalQuadraticCDF, _e_rq_cdf),
    (CoupledRationalQuadraticSpline,
     lambda m, o, p: _export(m.prqct, o, p + "prqct.")),
    (CircularCoupledRationalQuadraticSpline,
     lambda m, o, p: _export(m.prqct, o, p + "prqct.")),
    (AutoregressiveRationalQuadraticSpline,
     lambda m, o, p: _export(m.mprqat, o, p + "mprqat.")),
    (CircularAutoregressiveRationalQuadraticSpline,
     lambda m, o, p: _export(m.mprqat, o, p + "mprqat.")),
    (Coupling, _e_coupling),
    (Autoregressive, _e_autoregressive),
    (Planar, _e_named(("u", "w", "b"))),
    (Radial, lambda m, o, p: (_e_named(("z_0", "beta", "alpha"))(m, o, p),
                              o.__setitem__(p + "d", np.asarray(
                                  float(m.d), np.float32)))[0]),
    (Reverse, lambda m, o, p: _export(m.flow, o, p + "flow.")),
    (Composite, _e_composite),
    (Split, _e_none),
    (Merge, _e_none),
    (MixedPrecision, lambda m, o, p: _export(m.net, o, p)),
    (dist_base.GlowBase, _e_glow_base),
    (dist_base.DiagGaussian, _e_diag_gaussian),
    (dist_base.ClassCondDiagGaussian, _e_diag_gaussian),
    (dist_base.GaussianMixture,
     _e_named(("loc", "log_scale", "weight_scores"))),
    (dist_base.GaussianPCA, _e_named(("loc", "W", "log_sigma"))),
    (dist_base.AffineGaussian,
     lambda m, o, p: _export(m.transform, o, p + "transform.")),
)


def _export(mod, out, prefix):
    for typ, fn in _EXPORTERS:
        if isinstance(mod, typ):
            fn(mod, out, prefix)
            return
    if not jax.tree_util.tree_leaves(mod):
        return  # paramless (Squeeze, targets, transforms, ...)
    raise NotImplementedError(
        f"no state-dict exporter for {type(mod).__name__} at {prefix!r}")


def export_state_dict(model) -> dict:
    """Emit ``model``'s weights as a reference-format ``state_dict``
    ({dotted name: numpy array}); see the module docstring for coverage
    and the bookkeeping-buffer conventions."""
    out: dict = {}
    _export(model, out, "")
    return out
