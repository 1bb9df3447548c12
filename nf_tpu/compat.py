"""Checkpoint migration from the reference PyTorch package.

A user of the reference (normflows) holds trained weights as a torch
``state_dict`` — ``torch.save(model.state_dict(), ...)``. This module loads
that artifact into the structurally matching nf_tpu model, so switching
frameworks does not mean retraining:

    sd = torch.load("realnvp.pt")            # or any {name: array} mapping
    model = nf_tpu.models.build_realnvp(key, dim=2, K=64, hidden=[2, 64, 64, 2])
    model = nf_tpu.compat.import_state_dict(model, sd)

Covered module families (reference naming cited per converter): the
``NormalizingFlow`` containers, RealNVP layers (MaskedAffineFlow / ActNorm /
AffineConstFlow / Permute / Invertible1x1Conv / InvertibleAffine), the
neural-spline stack (Coupled/Autoregressive RQS wrappers, LULinearPermute),
MAF (MaskedAffineAutoregressive over MADE), Planar/Radial/Reverse/BatchNorm,
Glow (GlowBlock / ConvNet2d / MultiscaleFlow / GlowBase /
ClassCondDiagGaussian), residual flows (iResBlock over Lipschitz nets),
stochastic MCMC layers (MH / HMC), and the VAE encoders/decoders.
Values may be torch tensors or anything ``np.asarray`` accepts; torch is
never imported here (see :func:`save_state_dict_npz` for the bridge).

Our ``Scanned`` stacks (no reference equivalent) are handled by consuming K
consecutive reference flow indices and restacking — a reference checkpoint
with K unrolled layers loads into a ``scan=True`` model directly.

``strict=True`` (default) raises if any state-dict key was not consumed —
the guard against silently ignoring weights that have no home here.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .distributions import base as dist_base
from .distributions import decoder, encoder
from .flows import (
    ActNorm,
    AffineConstFlow,
    AffineCoupling,
    AffineCouplingBlock,
    CCAffineConst,
    BatchNorm,
    Composite,
    Reverse,
    Invertible1x1Conv,
    InvertibleAffine,
    LULinear,
    LULinearPermute,
    MaskedAffineAutoregressive,
    MaskedAffineFlow,
    Merge,
    Permute,
    Planar,
    Radial,
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
from .flows.residual import Residual, iResBlock
from .flows.stochastic import HamiltonianMonteCarlo, MetropolisHastings
from .nets.cnn import Conv2d, ConvNet2d, _NetActNorm
from .nets.lipschitz import (
    InducedNormConv2d,
    InducedNormLinear,
    LipschitzCNN,
    LipschitzMLP,
    Swish,
)
from .nets.made import (
    MADE,
    MaskedFeedforwardBlock,
    MaskedLinear,
    MaskedResidualBlock,
)
from .nets.mlp import MLP, Linear
from .nets.precision import MixedPrecision
from .nets.resnet import (
    ConvResidualNet,
    ResidualBlock,
    ResidualNet,
)


class _StateDict:
    """A {dotted name: array} view tracking which keys were consumed."""

    def __init__(self, mapping):
        self.data: Dict[str, Any] = dict(mapping)
        self.used = set()

    def has(self, key: str) -> bool:
        return key in self.data

    def get(self, key: str) -> jnp.ndarray:
        if key not in self.data:
            raise KeyError(
                f"state dict has no key {key!r}; nearest candidates: "
                f"{[k for k in self.data if k.startswith(key.rsplit('.', 1)[0])][:8]}")
        self.used.add(key)
        v = self.data[key]
        if hasattr(v, "detach"):  # torch tensor without importing torch
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v))

    def mark_used(self, key: str):
        if key in self.data:
            self.used.add(key)

    def has_prefix(self, prefix: str) -> bool:
        return any(k.startswith(prefix) for k in self.data)

    def indices(self, prefix: str):
        """Sorted integer child indices under ``prefix`` (``prefix.N....``)."""
        idx = set()
        for k in self.data:
            if k.startswith(prefix):
                head = k[len(prefix):].split(".", 1)[0]
                if head.isdigit():
                    idx.add(int(head))
        return sorted(idx)

    def unused(self):
        return sorted(set(self.data) - self.used)


def _maybe(sd: _StateDict, key: str, current):
    """Fetch ``key`` if present, else keep ``current`` (optional params)."""
    return sd.get(key) if sd.has(key) else current


# --- leaf nets ------------------------------------------------------------


def _conv_linear(mod, sd, p):
    """Linear / Conv2d: torch uses the same (out, in[, kh, kw]) layout."""
    return mod.replace(weight=sd.get(p + "weight"),
                       bias=sd.get(p + "bias") if sd.has(p + "bias")
                       else None)


def _masked_linear(mod: MaskedLinear, sd, p):
    sd.mark_used(p + "degrees")  # derivable from the mask; we don't store it
    return mod.replace(weight=sd.get(p + "weight"),
                       bias=sd.get(p + "bias") if sd.has(p + "bias")
                       else None,
                       mask=_maybe(sd, p + "mask", mod.mask))


def _mlp(mod: MLP, sd, p):
    """Reference MLP is an nn.Sequential ``net`` with Linears at the indices
    holding a ``weight`` (ref nets/mlp.py:7-52); zip them in order."""
    idxs = [i for i in sd.indices(p + "net.")
            if sd.has(f"{p}net.{i}.weight")]
    if len(idxs) != len(mod.linears):
        raise ValueError(f"{p}: reference MLP has {len(idxs)} Linear layers, "
                         f"model has {len(mod.linears)}")
    new = tuple(_conv_linear(l, sd, f"{p}net.{i}.")
                for l, i in zip(mod.linears, idxs))
    return mod.replace(linears=new)


def _net_actnorm(mod: _NetActNorm, sd, p):
    return mod.replace(s=sd.get(p + "s"), t=sd.get(p + "t"))


def _convnet2d(mod: ConvNet2d, sd, p):
    """Reference ConvNet2d interleaves Conv2d and utils.ActNorm inside one
    ``net`` Sequential (ref nets/cnn.py:5-63): classify each index by its
    key set and assign convs / actnorms in order."""
    convs, actnorms = [], []
    for i in sd.indices(p + "net."):
        if sd.has(f"{p}net.{i}.weight"):
            convs.append(f"{p}net.{i}.")
        elif sd.has(f"{p}net.{i}.s"):
            actnorms.append(f"{p}net.{i}.")
    if len(convs) != len(mod.convs):
        raise ValueError(f"{p}: reference ConvNet2d has {len(convs)} convs, "
                         f"model has {len(mod.convs)}")
    n_ours = 0 if mod.actnorms is None else len(mod.actnorms)
    if len(actnorms) != n_ours:
        raise ValueError(f"{p}: reference has {len(actnorms)} net-ActNorms, "
                         f"model has {n_ours}")
    for q in actnorms:
        sd.mark_used(q + "data_dep_init_done")
    return mod.replace(
        convs=tuple(_conv_linear(c, sd, q)
                    for c, q in zip(mod.convs, convs)),
        actnorms=None if mod.actnorms is None else tuple(
            _net_actnorm(a, sd, q)
            for a, q in zip(mod.actnorms, actnorms)))


def _residual_block(mod: ResidualBlock, sd, p):
    if mod.batch_norms is not None or sd.has(p + "batch_norm_layers.0.weight"):
        raise NotImplementedError(
            "batch_norm ResidualNets are not supported by the importer")
    ctx = mod.context_layer
    if ctx is not None:
        ctx = _conv_linear(ctx, sd, p + "context_layer.")
    return mod.replace(
        linears=tuple(_conv_linear(l, sd, f"{p}linear_layers.{i}.")
                      for i, l in enumerate(mod.linears)),
        context_layer=ctx)


def _head_to_bin_major(arr, head):
    """Reorder head rows from the reference's feature-major layout
    (row = d*mult + p) to our bin-major layout (row = p*D + d); see
    ``ResidualNet.bin_major_head``. Applies to weight/bias/mask alike."""
    if arr is None:
        return None
    d, mult = head
    a = jnp.asarray(arr)
    return a.reshape((d, mult) + a.shape[1:]).swapaxes(0, 1) \
        .reshape(a.shape)


def _residual_net(mod: ResidualNet, sd, p):
    final = _conv_linear(mod.final_layer, sd, p + "final_layer.")
    if mod.bin_major_head is not None:
        final = final.replace(
            weight=_head_to_bin_major(final.weight, mod.bin_major_head),
            bias=_head_to_bin_major(final.bias, mod.bin_major_head))
    return mod.replace(
        initial_layer=_conv_linear(mod.initial_layer, sd,
                                   p + "initial_layer."),
        blocks=tuple(_residual_block(b, sd, f"{p}blocks.{i}.")
                     for i, b in enumerate(mod.blocks)),
        final_layer=final)


def _conv_residual_block(mod, sd, p):
    """ConvResidualBlock: conv pair under ``conv_layers`` (ref
    resnet.py:107-156); batch-norm variants are not supported."""
    if mod.batch_norms is not None or sd.has(p + "batch_norm_layers.0.weight"):
        raise NotImplementedError(
            "batch_norm ConvResidualNets are not supported by the importer")
    ctx = mod.context_layer
    if ctx is not None:
        ctx = _conv_linear(ctx, sd, p + "context_layer.")
    return mod.replace(
        convs=tuple(_conv_linear(c, sd, f"{p}conv_layers.{i}.")
                    for i, c in enumerate(mod.convs)),
        context_layer=ctx)


def _conv_residual_net(mod, sd, p):
    return mod.replace(
        initial_layer=_conv_linear(mod.initial_layer, sd,
                                   p + "initial_layer."),
        blocks=tuple(_conv_residual_block(b, sd, f"{p}blocks.{i}.")
                     for i, b in enumerate(mod.blocks)),
        final_layer=_conv_linear(mod.final_layer, sd, p + "final_layer."))


def _made(mod: MADE, sd, p):
    blocks = []
    for i, b in enumerate(mod.blocks):
        q = f"{p}blocks.{i}."
        if isinstance(b, MaskedResidualBlock):
            ctx = b.context_layer
            if ctx is not None:
                ctx = _conv_linear(ctx, sd, q + "context_layer.")
            blocks.append(b.replace(
                linears=tuple(
                    _masked_linear(l, sd, f"{q}linear_layers.{j}.")
                    for j, l in enumerate(b.linears)),
                context_layer=ctx))
        elif isinstance(b, MaskedFeedforwardBlock):
            blocks.append(b.replace(
                linear=_masked_linear(b.linear, sd, q + "linear.")))
        else:
            raise NotImplementedError(f"MADE block {type(b).__name__}")
    ctx = mod.context_layer
    if ctx is not None:
        ctx = _conv_linear(ctx, sd, p + "context_layer.")
    final = _masked_linear(mod.final_layer, sd, p + "final_layer.")
    if mod.bin_major_head is not None:
        # only permute a mask that actually came from the state dict —
        # _masked_linear falls back to the model's own (already bin-major)
        # mask when the checkpoint carries no mask buffers, and permuting
        # that again would silently break autoregressivity
        mask = (_head_to_bin_major(final.mask, mod.bin_major_head)
                if sd.has(p + "final_layer.mask") else final.mask)
        final = final.replace(
            weight=_head_to_bin_major(final.weight, mod.bin_major_head),
            bias=_head_to_bin_major(final.bias, mod.bin_major_head),
            mask=mask)
    return mod.replace(
        initial_layer=_masked_linear(mod.initial_layer, sd,
                                     p + "initial_layer."),
        context_layer=ctx,
        blocks=tuple(blocks),
        final_layer=final)


# --- flow layers ----------------------------------------------------------


def _affine_const(mod: AffineConstFlow, sd, p):
    new = mod.replace(s=_maybe(sd, p + "s", mod.s),
                      t=_maybe(sd, p + "t", mod.t))
    if isinstance(mod, ActNorm):
        # honor the reference's init flag: a trained checkpoint has 1
        done = True
        if sd.has(p + "data_dep_init_done"):
            done = bool(np.asarray(sd.get(p + "data_dep_init_done")) > 0)
        new = new.replace(initialized=done)
    return new


def _masked_affine(mod: MaskedAffineFlow, sd, p):
    s = _convert(mod.s, sd, p + "s.") if mod.s is not None else None
    t = _convert(mod.t, sd, p + "t.") if mod.t is not None else None
    return mod.replace(b=sd.get(p + "b"), s=s, t=t)


def _lu_conv(mod, sd, p):
    sd.mark_used(p + "eye")
    if mod.use_lu:
        return mod.replace(L=sd.get(p + "L"), U=sd.get(p + "U"),
                           log_S=sd.get(p + "log_S"), P=sd.get(p + "P"),
                           sign_S=sd.get(p + "sign_S"))
    return mod.replace(W=sd.get(p + "W"))


def _lu_linear(mod: LULinear, sd, p):
    return mod.replace(
        lower_entries=sd.get(p + "lower_entries"),
        upper_entries=sd.get(p + "upper_entries"),
        unconstrained_upper_diag=sd.get(p + "unconstrained_upper_diag"),
        bias=sd.get(p + "bias"))


def _permutation(mod: _Permutation, sd, p):
    perm = sd.get(p + "_permutation").astype(jnp.int32)
    return mod.replace(permutation=perm, inv_permutation=jnp.argsort(perm))


def _permute(mod: Permute, sd, p):
    # ref shuffle-mode Permute registers BOTH perm and inv_perm as
    # persistent buffers (ref flows/mixing.py:29-30); inv_perm is
    # derivable, so consume and recompute it. Swap mode has no state.
    if sd.has(p + "perm"):
        sd.mark_used(p + "inv_perm")
        perm = sd.get(p + "perm").astype(jnp.int32)
        return mod.replace(perm=perm, inv_perm=jnp.argsort(perm))
    return mod


def _rq_cdf(mod: PiecewiseRationalQuadraticCDF, sd, p):
    return mod.replace(
        unnormalized_widths=sd.get(p + "unnormalized_widths"),
        unnormalized_heights=sd.get(p + "unnormalized_heights"),
        unnormalized_derivatives=sd.get(p + "unnormalized_derivatives"))


def _coupling(mod: Coupling, sd, p):
    for name, ours in (("identity_features", mod.identity_features),
                       ("transform_features", mod.transform_features)):
        if sd.has(p + name):
            ref = np.asarray(sd.get(p + name)).ravel()
            # ORDER matters: the conditioner's output slots map to
            # features positionally, so same-set-different-order is a
            # silently wrong import, not a benign relabeling
            if not np.array_equal(ref, np.asarray(ours)):
                raise ValueError(
                    f"{p}{name} mismatch: checkpoint {ref.tolist()} vs "
                    f"model {list(ours)} — rebuild the model with the "
                    f"checkpoint's mask")
    uncond = mod.unconditional_transform
    if uncond is not None:
        uncond = _convert(uncond, sd, p + "unconditional_transform.")
    return mod.replace(
        transform_net=_convert(mod.transform_net, sd, p + "transform_net."),
        unconditional_transform=uncond)


def _autoregressive(mod: Autoregressive, sd, p):
    return mod.replace(
        autoregressive_net=_convert(mod.autoregressive_net, sd,
                                    p + "autoregressive_net."))


def _induced_norm(mod, sd, p):
    """InducedNormLinear/Conv2d: weight/bias params plus the converged
    power-iteration vectors u/v (buffers). The reference's ``scale`` buffer
    is a running sigma used only by its one-iter bookkeeping — derivable,
    skipped (ref nets/lipschitz.py:168,266)."""
    for name in ("scale", "initialized", "spatial_dims"):
        # conv variant also registers initialized/spatial_dims buffers
        # (ref nets/lipschitz.py:334-335) — config, not weights
        sd.mark_used(p + name)
    return mod.replace(weight=sd.get(p + "weight"),
                       bias=sd.get(p + "bias") if sd.has(p + "bias")
                       else None,
                       u=_maybe(sd, p + "u", mod.u),
                       v=_maybe(sd, p + "v", mod.v))


def _lipschitz_net(mod, sd, p):
    """LipschitzMLP/CNN: our ``layers`` alternate Swish / induced-norm
    layers in the same order as the reference's ``net`` Sequential."""
    out = []
    for i, layer in enumerate(mod.layers):
        q = f"{p}net.{i}."
        if isinstance(layer, Swish):
            out.append(layer.replace(beta=sd.get(q + "beta")))
        else:
            out.append(_induced_norm(layer, sd, q))
    return mod.replace(layers=tuple(out))


def _iresblock(mod: iResBlock, sd, p):
    for name in ("last_n_samples", "last_firmom", "last_secmom"):
        sd.mark_used(p + name)  # logging buffers, not model state
    return mod.replace(geom_p_logit=sd.get(p + "geom_p"),
                       lamb=sd.get(p + "lamb"),
                       nnet=_convert(mod.nnet, sd, p + "nnet."))


def _residual(mod: Residual, sd, p):
    return mod.replace(iresblock=_iresblock(mod.iresblock, sd,
                                            p + "iresblock."))


def _metropolis(mod: MetropolisHastings, sd, p):
    prop = mod.proposal
    if sd.has(p + "proposal.scale"):
        prop = prop.replace(scale=sd.get(p + "proposal.scale"))
    return mod.replace(target=_convert(mod.target, sd, p + "target."),
                       proposal=prop)


def _hmc(mod: HamiltonianMonteCarlo, sd, p):
    return mod.replace(target=_convert(mod.target, sd, p + "target."),
                       log_step_size=sd.get(p + "log_step_size"),
                       log_mass=sd.get(p + "log_mass"))


def _net_holder(field):
    """Modules whose only state is a conditioner net under ``field`` (VAE
    encoders/decoders — ref distributions/encoder.py, decoder.py; the
    conditional base's context encoder — ref distributions/base.py:106)."""
    def conv(mod, sd, p):
        return mod.replace(
            **{field: _convert(getattr(mod, field), sd, f"{p}{field}.")})
    return conv


def _radial(mod: Radial, sd, p):
    sd.mark_used(p + "d")  # persistent dim buffer (ref flows/radial.py:25)
    return mod.replace(z_0=sd.get(p + "z_0"), beta=sd.get(p + "beta"),
                       alpha=sd.get(p + "alpha"))


def _named_arrays(names):
    """Copy plain array fields whose names match the reference's 1:1
    (Planar u/w/b — ref flows/planar.py; Radial z_0/beta/alpha — ref
    flows/radial.py)."""
    def conv(mod, sd, p):
        return mod.replace(**{n: sd.get(p + n) for n in names})
    return conv


def _flow_seq(our_flows, sd, p):
    """Map our flow tuple onto the reference's ``ModuleList`` indices.

    Every logical layer owns one reference index — paramless layers
    (Squeeze, Split, Reverse, ...) occupy an index but contribute no keys,
    so we count positions rather than matching only key-bearing indices.
    Our ``Scanned`` stacks (no reference equivalent) consume ``num_layers``
    consecutive indices: unstack → convert per layer → restack.
    """
    def convert_at(layer, cursor):
        """Convert one logical layer; returns (converted, indices used).

        A plain ``Composite`` (exactly that type — subclasses like
        GlowBlock exist in the reference with nested ``flows.N.flows.M``
        keys) is usually OUR scan-grouping artifact over layers the
        reference keeps flat; when the checkpoint has no nested keys at
        this index, convert its sub-flows against consecutive flat
        indices instead.
        """
        if (type(layer) is Composite
                and not sd.has_prefix(f"{p}{cursor}.flows.")):
            subs, used = [], 0
            for sf in layer.flows:
                s_new, s_used = convert_at(sf, cursor + used)
                subs.append(s_new)
                used += s_used
            return layer.replace(flows=tuple(subs)), used
        return _convert(layer, sd, f"{p}{cursor}."), 1

    out, cursor = [], 0
    for f in our_flows:
        if isinstance(f, Scanned):
            layers = []
            for j in range(f.num_layers):
                layer = jax.tree_util.tree_map(lambda a, j=j: a[j], f.stacked)
                new, used = convert_at(layer, cursor)
                layers.append(new)
                cursor += used
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *layers)
            out.append(f.replace(stacked=stacked))
        else:
            new, used = convert_at(f, cursor)
            out.append(new)
            cursor += used
    ref_idx = sd.indices(p)
    if ref_idx and ref_idx[-1] >= cursor:
        raise ValueError(
            f"{p}: checkpoint has flow entries up to index {ref_idx[-1]} "
            f"but the model has only {cursor} layers — architectures "
            f"differ")
    return tuple(out)


def _container(mod, sd, p):
    q0 = _convert(mod.q0, sd, p + "q0.")
    return mod.replace(q0=q0, flows=_flow_seq(mod.flows, sd, p + "flows."))


def _multiscale(mod: core.MultiscaleFlow, sd, p):
    q0 = tuple(_convert(q, sd, f"{p}q0.{i}.")
               for i, q in enumerate(mod.q0))
    flows = tuple(_flow_seq(fl, sd, f"{p}flows.{i}.")
                  for i, fl in enumerate(mod.flows))
    merges = tuple(_convert(m, sd, f"{p}merges.{i}.")
                   for i, m in enumerate(mod.merges))
    transform = mod.transform
    if transform is not None:
        transform = _convert(transform, sd, p + "transform.")
    return mod.replace(q0=q0, flows=flows, merges=merges,
                       transform=transform)


def _composite(mod: Composite, sd, p):
    return mod.replace(flows=_flow_seq(mod.flows, sd, p + "flows."))


def _coupling_block(mod: AffineCouplingBlock, sd, p):
    """Reference AffineCouplingBlock is a plain flow list
    [Split, AffineCoupling, Merge] (ref flows/affine/coupling.py:214-240)."""
    return mod.replace(
        coupling=_convert(mod.coupling, sd, p + "flows.1."))


def _affine_coupling(mod: AffineCoupling, sd, p):
    return mod.replace(param_map=_convert(mod.param_map, sd,
                                          p + "param_map."))


def _diag_gaussian(mod, sd, p):
    return mod.replace(loc=sd.get(p + "loc"),
                       log_scale=sd.get(p + "log_scale"))


def _glow_base(mod: dist_base.GlowBase, sd, p):
    new = mod.replace(loc=sd.get(p + "loc"),
                      loc_logs=sd.get(p + "loc_logs"),
                      log_scale=sd.get(p + "log_scale"),
                      log_scale_logs=sd.get(p + "log_scale_logs"))
    if mod.loc_cc is not None:
        new = new.replace(loc_cc=sd.get(p + "loc_cc"),
                          log_scale_cc=sd.get(p + "log_scale_cc"))
    return new


def _uniform_gaussian(mod, sd, p):
    # all four reference entries are buffers; scale is the only trainable
    # one in spirit, but they transfer together (ref base.py:198-270)
    new = mod.replace(scale=sd.get(p + "scale"))
    for name in ("ind", "ind_", "inv_perm"):
        if sd.has(p + name):
            new = new.replace(**{name: sd.get(p + name).astype(jnp.int32)})
    return new


def _cc_affine_const(mod, sd, p):
    new = mod.replace(s=sd.get(p + "s"), t=sd.get(p + "t"))
    if sd.has(p + "s_cc"):
        new = new.replace(s_cc=sd.get(p + "s_cc"),
                          t_cc=sd.get(p + "t_cc"))
    return new


def _wrapper_prqct(mod, sd, p):
    return mod.replace(prqct=_convert(mod.prqct, sd, p + "prqct."))


def _wrapper_mprqat(mod, sd, p):
    return mod.replace(mprqat=_convert(mod.mprqat, sd, p + "mprqat."))


def _lu_linear_permute(mod: LULinearPermute, sd, p):
    return mod.replace(
        permutation=_permutation(mod.permutation, sd, p + "permutation."),
        linear=_lu_linear(mod.linear, sd, p + "linear."))


def _identity(mod, sd, p):
    return mod


def _batch_norm(mod, sd, p):
    sd.mark_used(p + "eps")  # the reference registers eps as a buffer
    return mod


# Order matters: subclasses before base classes.
_CONVERTERS = (
    (core.MultiscaleFlow, _multiscale),
    (core.NormalizingFlow, _container),
    (core.ConditionalNormalizingFlow, _container),
    (core.ClassCondFlow, _container),
    (MaskedLinear, _masked_linear),
    (Linear, _conv_linear),
    (Conv2d, _conv_linear),
    (MLP, _mlp),
    (ConvNet2d, _convnet2d),
    (_NetActNorm, _net_actnorm),
    (ResidualNet, _residual_net),
    (ConvResidualNet, _conv_residual_net),
    (MADE, _made),
    (MaskedAffineFlow, _masked_affine),
    (ActNorm, _affine_const),
    (CCAffineConst, _cc_affine_const),
    (AffineConstFlow, _affine_const),
    (Invertible1x1Conv, _lu_conv),
    (InvertibleAffine, _lu_conv),
    (LULinearPermute, _lu_linear_permute),
    (LULinear, _lu_linear),
    (_Permutation, _permutation),
    (Permute, _permute),
    (AffineCouplingBlock, _coupling_block),
    (AffineCoupling, _affine_coupling),
    (PiecewiseRationalQuadraticCDF, _rq_cdf),
    (CoupledRationalQuadraticSpline, _wrapper_prqct),
    (CircularCoupledRationalQuadraticSpline, _wrapper_prqct),
    (AutoregressiveRationalQuadraticSpline, _wrapper_mprqat),
    (CircularAutoregressiveRationalQuadraticSpline, _wrapper_mprqat),
    (Coupling, _coupling),
    (MaskedAffineAutoregressive, _autoregressive),
    (Autoregressive, _autoregressive),
    (Planar, _named_arrays(("u", "w", "b"))),
    (Radial, _radial),
    (Residual, _residual),
    (iResBlock, _iresblock),
    (InducedNormLinear, _induced_norm),
    (InducedNormConv2d, _induced_norm),
    (LipschitzMLP, _lipschitz_net),
    (LipschitzCNN, _lipschitz_net),
    (MetropolisHastings, _metropolis),
    (HamiltonianMonteCarlo, _hmc),
    (Composite, _composite),
    (Split, _identity),
    (Merge, _identity),
    # Reverse wraps one flow under `flow.` (ref flows/base.py:27); our
    # BatchNorm is paramless but the reference registers eps as a buffer
    (Reverse, _net_holder("flow")),
    (BatchNorm, _batch_norm),
    # transparent bf16 wrapper — no reference level, same prefix
    (MixedPrecision, lambda m, sd, p: m.replace(net=_convert(m.net, sd, p))),
    (dist_base.GlowBase, _glow_base),
    (dist_base.DiagGaussian, _diag_gaussian),
    (dist_base.ClassCondDiagGaussian, _diag_gaussian),
    (dist_base.ConditionalDiagGaussian, _net_holder("context_encoder")),
    (dist_base.GaussianMixture,
     _named_arrays(("loc", "log_scale", "weight_scores"))),
    (dist_base.GaussianPCA, _named_arrays(("loc", "W", "log_sigma"))),
    (dist_base.AffineGaussian, _net_holder("transform")),
    (dist_base.UniformGaussian, _uniform_gaussian),
    (encoder.NNDiagGaussian, _net_holder("net")),
    (encoder.ConstDiagGaussian, _named_arrays(("loc", "scale"))),
    (decoder.NNDiagGaussianDecoder, _net_holder("net")),
    (decoder.NNBernoulliDecoder, _net_holder("net")),
)


def _convert(mod, sd: _StateDict, prefix: str):
    for typ, fn in _CONVERTERS:
        if isinstance(mod, typ):
            return fn(mod, sd, prefix)
    leaves = jax.tree_util.tree_leaves(mod)
    if not leaves:
        return mod  # paramless layer (Squeeze, Reverse, targets, ...)
    raise NotImplementedError(
        f"no state-dict converter for {type(mod).__name__} at "
        f"{prefix!r}; supported types: "
        f"{sorted({t.__name__ for t, _ in _CONVERTERS})}")


def save_state_dict_npz(state_dict, path):
    """Write a torch ``state_dict`` to ``.npz`` (run this on the torch
    side; the TPU host then needs no torch to import the checkpoint)."""
    arrays = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        arrays[k] = np.asarray(v)
    np.savez(path, **arrays)


def load_state_dict_npz(path):
    """Load an ``.npz`` written by :func:`save_state_dict_npz` back into a
    {name: array} mapping for :func:`import_state_dict`."""
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def import_state_dict(model, state_dict, strict: bool = True):
    """Load a reference (normflows) ``state_dict`` into ``model``.

    ``model`` must be the architecturally matching nf_tpu model (same layer
    sequence, widths, masks). ``state_dict`` maps dotted reference names to
    torch tensors / numpy arrays. ``strict=True`` raises if any checkpoint
    key goes unused (a structural mismatch); missing keys always raise.
    """
    sd = _StateDict(state_dict)
    new = _convert(model, sd, "")
    if strict and sd.unused():
        raise ValueError(
            f"{len(sd.unused())} checkpoint keys were not consumed "
            f"(first 10): {sd.unused()[:10]} — pass strict=False to ignore")
    return new
