"""MEND_VL — meta-learned gradient-transform editor.

Rebuild of ``editor/vllm_editors/mend_vl/``:

- **Capture** (mend_vl.py:63-85 + 186-195): for each edited linear
  (fc1/fc2 of decoder layers 29-31 by default), take the per-token input
  ``x`` and output-gradient ``δ`` of the edit loss. Hooks become the
  dummy-zero trick in ``decoder_forward_with_fc_probes``: δ = ∂loss/∂z.
- **GradientTransform** (auxiliary_networks.py:90-151): Welford-running
  normalization of (x, δ) rows + an IDMLP (residual clamped low-rank
  linears, auxiliary_networks.py:4-79) with per-module mode scale/shift;
  one transform per linear *shape*, shared across same-shape modules
  (mend_vl.py:200-223).
- **Update** (mend_vl.py:98-114): Δ = x̃ᵀ δ̃ · lr / n_rows, running-mean
  averaged across sequential edit batches; applied additively to the
  weight (our [in, out] layout adds Δ directly).
- **Training** (mend_vl.py:290-341): edit on the batch, then rel CE +
  gen CE + loc KL through the edited weights, grads to the aux nets and
  per-module edit lrs, grad-norm clip 100.

Token filtering: the reference drops all-zero (x, δ) rows
(auxiliary_networks.py:115-117); jit-stable equivalent: a row-weight
mask zeroing excluded rows after the transform and in the Welford stats.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import decoder as dec
from ..core.wrapper import JaxVLLM, QueryBatch
from ..utils.config import BaseConfig
from ..utils.surgery import ParamTarget, add_to_target, get_target
from .base import EditRequest, VLLMEditor, instance_jit


@dataclasses.dataclass(frozen=True)
class MENDvlConfig(BaseConfig):
    @dataclasses.dataclass(frozen=True)
    class AuxModelConfig(BaseConfig):
        n_hidden: int = 1
        hidden_dim: int = 0  # unused by IDMLP (reference passes null)
        init: str = "id"
        norm: bool = True
        act: str = "relu"
        rank: int = 1920
        shared: bool = True
        lr: float = 1e-6

    edit_model_name: str = ""
    # (layer, module) pairs; the reference's edit_modules strings
    # "…layers.29.fc1" etc. (configs/mend_vl/blip2-opt-2.7b.yaml).
    # OPT decoders edit fc1/fc2; llama-arch decoders edit gate/up/down
    # (the reference's mlp.{gate,up,down}_proj,
    # configs/mend_vl/llava-v1.5-7b.yaml).
    edit_layers: Tuple[int, ...] = (29, 30, 31)
    edit_modules: Tuple[str, ...] = ("fc1", "fc2")
    init_edit_lr: float = 1e-4
    edit_lr_lr: float = 1e-4
    relia_lambda: float = 0.1
    gen_lambda: float = 0.1
    loc_lambda: float = 0.1
    # DE-VQA analysis loss variant ('0'..'7', '3IC', 'cl', 'cl_n') —
    # MultimodalTrainer.py:295-1043; see train/loss_variants.py.
    train_loss_variant: str = "0"
    aux_model: "MENDvlConfig.AuxModelConfig" = dataclasses.field(
        default_factory=lambda: MENDvlConfig.AuxModelConfig())


# ---------------------------------------------------------------------------
# GradientTransform (per linear shape)
# ---------------------------------------------------------------------------

def init_gradient_transform(key, x_dim: int, delta_dim: int,
                            cfg: MENDvlConfig.AuxModelConfig, n_modes: int):
    dim = x_dim + delta_dim
    mid = min(cfg.rank, dim)
    ks = jax.random.split(key, cfg.n_hidden + 2)
    layers = []
    for i in range(cfg.n_hidden + 1):
        if cfg.init == "id":
            u = jnp.zeros((dim, mid))
            v = jax.random.normal(ks[i], (mid, dim))
        else:  # xavier
            k1, k2 = jax.random.split(ks[i])
            u = jax.random.normal(k1, (dim, mid)) * (2.0 / (dim + mid)) ** 0.5
            v = jax.random.normal(k2, (mid, dim)) * (2.0 / (dim + mid)) ** 0.5
        layers.append({
            "u": u, "v": v, "bias": jnp.zeros((dim,)),
            "mode_scale": jnp.ones((n_modes, dim)),
            "mode_shift": jnp.zeros((n_modes, dim)),
        })
    return {"layers": layers}


def init_gt_norm_state(x_dim: int, delta_dim: int):
    """Welford buffers (auxiliary_networks.py:98-105)."""
    return {
        "u_mean": jnp.zeros((x_dim,)), "u_s": jnp.zeros((x_dim,)),
        "v_mean": jnp.zeros((delta_dim,)), "v_s": jnp.zeros((delta_dim,)),
        "k": jnp.zeros(()),
    }


def welford_update(norm, u_rows, v_rows, w):
    """Merge a weighted batch of rows into the running stats (Chan's
    parallel formula ≡ the reference's sequential update_counter)."""
    nb = w.sum()

    def merge(mean, s, rows):
        bm = (rows * w[:, None]).sum(0) / jnp.maximum(nb, 1.0)
        bs = (jnp.square(rows - bm) * w[:, None]).sum(0)
        k = norm["k"]
        delta = bm - mean
        tot = k + nb
        new_mean = jnp.where(tot > 0, mean + delta * nb / jnp.maximum(tot, 1.0),
                             mean)
        new_s = s + bs + jnp.square(delta) * k * nb / jnp.maximum(tot, 1.0)
        return new_mean, new_s

    u_mean, u_s = merge(norm["u_mean"], norm["u_s"], u_rows)
    v_mean, v_s = merge(norm["v_mean"], norm["v_s"], v_rows)
    return {"u_mean": u_mean, "u_s": u_s, "v_mean": v_mean, "v_s": v_s,
            "k": norm["k"] + nb}


def gt_apply(params, norm, cfg: MENDvlConfig.AuxModelConfig,
             u_rows, v_rows, w, mode: int):
    """GradientTransform.forward (auxiliary_networks.py:110-151) on
    weighted rows. → (x̃ [N, x_dim], δ̃ [N, delta_dim]) with excluded rows
    zeroed."""
    x_dim = u_rows.shape[-1]
    if cfg.norm:
        # Untrained stats (k<2, Welford buffers all zero) would divide by
        # u_std=0+1e-7 and scale inputs ~1e7 (deltas ~1e14) silently —
        # fall back to identity until real stats exist. The reference
        # normalizes unconditionally but never edits untrained.
        trained = norm["k"] >= 2.0
        u_std = jnp.sqrt(norm["u_s"] / jnp.maximum(norm["k"] - 1, 1.0))
        v_std = jnp.sqrt(norm["v_s"] / jnp.maximum(norm["k"] - 1, 1.0))
        u_in = jnp.where(trained,
                         (u_rows - norm["u_mean"]) / (u_std + 1e-7), u_rows)
        v_in = jnp.where(trained,
                         (v_rows - norm["v_mean"]) / (v_std + 1e-7), v_rows)
    else:
        u_in, v_in = u_rows, v_rows
    h = jnp.concatenate([u_in, v_in], axis=-1)
    n_layers = len(params["layers"])
    for i, lp in enumerate(params["layers"]):
        pre = (h @ lp["v"].T) @ lp["u"].T + lp["bias"]
        pre = pre * lp["mode_scale"][mode] + lp["mode_shift"][mode]
        actd = jnp.maximum(pre, 0.0)  # clamp (always, per LRLinear.forward)
        h = actd + h if cfg.init == "id" else actd
    out1, out2 = h[..., :x_dim], h[..., x_dim:]
    return out1 * w[:, None], out2 * w[:, None]


# ---------------------------------------------------------------------------
# Editor
# ---------------------------------------------------------------------------

class MENDvl(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: MENDvlConfig, params=None,
                 seed: int = 0):
        super().__init__(vllm)
        self.cfg = config
        dcfg = vllm.cfg.decoder
        mods = dec.MLP_MODULES.get(dcfg.arch)
        if mods is None:
            raise NotImplementedError("MEND probes: arch %r" % dcfg.arch)
        edit_modules = tuple(m for m in config.edit_modules if m in mods)
        assert edit_modules, (
            "edit_modules %r has no module of arch %r (expected among %r)"
            % (config.edit_modules, dcfg.arch, mods))
        self.targets: List[Tuple[int, str]] = [
            (l, m) for l in config.edit_layers for m in edit_modules]
        self.probe_layers = tuple(sorted(set(config.edit_layers)))
        # group by (in_dim, out_dim) shape (mend_vl.py:200-214)
        d, f = dcfg.d_model, dcfg.d_ffn
        self.shape_of = ({"fc1": (d, f), "fc2": (f, d)} if dcfg.arch == "opt"
                         else {"gate": (d, f), "up": (d, f), "down": (f, d)})
        shapes = {}
        self.mode_of: Dict[Tuple[int, str], int] = {}
        for (l, m) in self.targets:
            s = self.shape_of[m]
            self.mode_of[(l, m)] = len(shapes.get(s, []))
            shapes.setdefault(s, []).append((l, m))
        self.shapes = shapes
        if params is None:
            params = self._init_params(seed)
        self.params = params
        self.norm_state = {str(s): init_gt_norm_state(*s) for s in shapes}
        self.restore_to_original_model()

    def _init_params(self, seed: int):
        keys = jax.random.split(jax.random.PRNGKey(seed), len(self.shapes) + 1)
        params = {"aux": {}, "edit_lrs": {}}
        for k, s in zip(keys, self.shapes):
            params["aux"][str(s)] = init_gradient_transform(
                k, s[0], s[1], self.cfg.aux_model, len(self.shapes[s]))
        for (l, m) in self.targets:
            params["edit_lrs"]["%d.%s" % (l, m)] = jnp.asarray(
                self.cfg.init_edit_lr)
        return params

    def name_of_editor_and_model(self):
        return "mend_vl", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return True

    def restore_to_original_model(self):
        dcfg = self.vllm.cfg.decoder
        self.deltas = {
            (l, m): {"dw": jnp.zeros(self.shape_of[m]), "n": jnp.zeros(())}
            for (l, m) in self.targets}

    # ------------------------------------------------------------------

    @instance_jit(static_argnums=(2,))
    def _capture(self, vparams, qb_arrays, train_norm: bool):
        """(x, δ, w) per target from the edit loss (the __edit_batch__
        gradient capture, mend_vl.py:186-195). Arch-generic via the
        module-keyed linear probes. Jitted: train_step calls this on
        every meta-step, and an eager 2.7b forward+backward dispatches
        hundreds of individual ops through the remote tunnel."""
        embeds, kv, labels, masks = qb_arrays
        vcfg = self.vllm.cfg
        B, L, _ = embeds.shape
        dcfg = vcfg.decoder
        targets = tuple(self.targets)
        zs = tuple(jnp.zeros((B, L, self.shape_of[m][1])) for (_, m) in targets)

        def loss_fn(zs):
            logits, xs = dec.decoder_forward_with_linear_probes(
                vparams["decoder"], dcfg, embeds, kv, targets, zs)
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            m = masks.astype(jnp.float32)
            return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0), xs

        (loss, xs), dzs = jax.value_and_grad(loss_fn, has_aux=True)(zs)
        out = {}
        w_row = kv.reshape(-1).astype(jnp.float32)  # valid-token rows
        for t, d in zip(targets, dzs):
            x = xs[t]
            xr = x.reshape(-1, x.shape[-1])
            dr = d.reshape(-1, d.shape[-1])
            nz = (jnp.any(xr != 0, -1) & jnp.any(dr != 0, -1)).astype(
                jnp.float32) * w_row
            out[t] = (jax.lax.stop_gradient(xr),
                      jax.lax.stop_gradient(dr), nz)
        return out

    def _transform(self, params, norm_state, captured):
        """aux transform + rank-1 outer products → {target: (Δ, n)}.

        ``norm_state`` is keyed by shape (eval: frozen stats) or by
        "layer.module" (training: the per-module staleness snapshots —
        see train_step)."""
        deltas = {}
        for (l, m), (xr, dr, w) in captured.items():
            s = self.shape_of[m]
            aux = params["aux"][str(s)]
            key = "%d.%s" % (l, m)
            norm = norm_state[key] if key in norm_state else norm_state[str(s)]
            xt, dt = gt_apply(aux, norm, self.cfg.aux_model, xr, dr, w,
                              self.mode_of[(l, m)])
            lr = params["edit_lrs"]["%d.%s" % (l, m)]
            n = jnp.maximum(w.sum(), 1.0)
            dw = (xt.T @ dt) * lr / n
            deltas[(l, m)] = (dw, w.sum())
        return deltas

    def _edited_vparams(self, vparams, deltas):
        for (l, m), val in deltas.items():
            if isinstance(val, dict):
                dw = val["dw"]
            elif isinstance(val, tuple):
                dw = val[0]
            else:
                dw = val
            vparams = add_to_target(
                vparams, ParamTarget(("decoder", "layers", m, "w"), l), dw)
        return vparams

    @instance_jit()
    def _edit_jit(self, params, norm_state, vparams, deltas, embeds, kv,
                  labels, masks):
        # Sequential-edit capture runs through the ALREADY-edited model:
        # the reference's forward_edit_hook stays registered during
        # __edit_batch__ (mend_vl.py:63-98), so edit k's x and δ see the
        # running-mean deltas of edits 1..k-1 (no-op on the first edit).
        vp = self._edited_vparams(vparams, deltas)
        captured = self._capture(vp, (embeds, kv, labels, masks), False)
        new = self._transform(params, norm_state, captured)
        out = {}
        for key, st in deltas.items():
            dw_new, n_new = new[key]
            tot = st["n"] + n_new
            dw = (st["dw"] * st["n"] + dw_new * n_new) / jnp.maximum(tot, 1.0)
            out[key] = {"dw": dw, "n": tot}
        return out

    def edit_batch(self, requests: List[EditRequest], pad_width=None):
        # pad_width ignored: running-mean deltas average over batch rows,
        # so padding would reweight the update (base.edit_batch).
        qb = self.vllm.encode_queries(
            [r["prompt"] for r in requests],
            [r.get("image") for r in requests],
            [r["target_new"] for r in requests])
        self.deltas = self._edit_jit(
            self.params, self.norm_state, self.vllm.params, self.deltas,
            qb.embeds, qb.kv_valid, qb.label_ids, qb.label_masks)

    def edit_one_piece(self, request: EditRequest):
        self.edit_batch([request])

    @instance_jit()
    def _logits_jit(self, vparams, deltas, embeds, kv):
        vcfg = self.vllm.cfg
        vp = self._edited_vparams(vparams, deltas)
        h = dec.decoder_forward(vp["decoder"], vcfg.decoder, embeds, kv)
        return dec.decoder_logits(vp["decoder"], vcfg.decoder, h)

    def query_logits(self, qb: QueryBatch):
        return self._logits_jit(self.vllm.params, self.deltas, qb.embeds,
                                qb.kv_valid)


class MENDvlTrainable(MENDvl):
    """Meta-training (mend_vl.py:248-341)."""

    def __init__(self, vllm, config, params=None, seed: int = 0):
        super().__init__(vllm, config, params=params, seed=seed)
        self.train_init_editor(seed)
        if params is not None:
            self.params = params

    def organize_batch_data(self, cases):
        """All generality rows (and all locality rows) ride ONE QueryBatch
        — per-key means are recovered by reshape, keeping the training
        graph a constant number of forwards regardless of probe count.

        The configured loss variant's extra probe batches are built here
        (vqa.py collate semantics): TC = edit query under the m_loc
        image, TO = edit query with no image, IC = retrieved close
        question (t2) under the edit image, TO_IC = close question with
        no image."""
        from ..train.loss_variants import required_probes

        def enc(lst):
            return self.vllm.encode_queries([x[0] for x in lst],
                                            [x[1] for x in lst],
                                            [x[2] for x in lst])

        B = len(cases)
        rel = enc([(c.requests[0]["prompt"], c.requests[0]["image"],
                    c.requests[0]["target_new"]) for c in cases])
        gen_keys = list(cases[0].generality.keys())
        loc_keys = list(cases[0].locality.keys())
        gens = enc([(c.generality[k][0]["prompt"], c.generality[k][0]["image"],
                     c.generality[k][0]["target"])
                    for k in gen_keys for c in cases])
        locs = enc([(c.locality[k][0]["prompt"], c.locality[k][0]["image"],
                     c.locality[k][0]["target"])
                    for k in loc_keys for c in cases])
        extras = {}
        for name in required_probes(self.cfg.train_loss_variant):
            rows = []
            for c in cases:
                r = c.requests[0]
                t2 = c.locality.get("t2i1", c.locality.get("t1i2"))
                t2 = t2[0] if t2 else {"prompt": r["prompt"],
                                       "target": r["target_new"]}
                m_loc = c.locality["t3i3"][0]["image"] \
                    if c.locality.get("t3i3") else None
                if name == "tc":
                    rows.append((r["prompt"], m_loc, r["target_new"]))
                elif name == "to":
                    rows.append((r["prompt"], None, r["target_new"]))
                elif name == "ic":
                    rows.append((t2["prompt"], r["image"], t2["target"]))
                elif name == "to_ic":
                    rows.append((t2["prompt"], None, t2["target"]))
            extras[name] = enc(rows)
        gi_img = gen_keys.index("image_rephrase") \
            if "image_rephrase" in gen_keys else 0
        return {"rel": rel, "gens": gens, "locs": locs, "extras": extras,
                "B": B, "G": len(gen_keys), "K": len(loc_keys),
                "GI_IMG": gi_img}

    def train_step(self, batch):
        vparams = self.vllm.params
        rel: QueryBatch = batch["rel"]

        # Welford stats update happens outside the grad (buffers), with
        # the reference's per-module staleness: GradientTransform.forward
        # in training mode updates the shared stats with THIS module's
        # rows then normalizes (auxiliary_networks.py:122-140), so the
        # first module of a shape group is normalized WITHOUT the later
        # modules' rows. Snapshot the running stats after each module's
        # update and transform that module with its own snapshot.
        captured = self._capture(
            vparams, (rel.embeds, rel.kv_valid, rel.label_ids,
                      rel.label_masks), False)
        per_target_norm = {}
        for s, mods in self.shapes.items():
            norm = self.norm_state[str(s)]
            for (l, m) in mods:  # encounter order == reference edit_modules
                xr, dr, w = captured[(l, m)]
                norm = welford_update(norm, xr, dr, w)
                per_target_norm["%d.%s" % (l, m)] = norm
            self.norm_state[str(s)] = norm

        self.params, self._opt_state, loss, logs = self._meta_step_jit(
            self.params, self._opt_state, per_target_norm, vparams,
            captured, batch["rel"], batch["gens"], batch["locs"],
            batch.get("extras", {}), batch["B"], batch["G"], batch["K"],
            batch.get("GI_IMG", 0))
        return float(loss), {k: float(v) for k, v in logs.items()}

    @instance_jit(static_argnums=(9, 10, 11, 12))
    def _meta_step_jit(self, params, opt_state, norm_state, vparams,
                       captured, rel, gens, locs, extras, B, G, K, GI_IMG):
        cfg = self.cfg
        vcfg = self.vllm.cfg

        def per_row_ce(logits, qb):
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(logp, qb.label_ids[..., None], -1)[..., 0]
            m = qb.label_masks.astype(jnp.float32)
            return -(picked * m).sum(-1), m.sum(-1)

        def fwd(vp, qb):
            h = dec.decoder_forward(vp["decoder"], vcfg.decoder, qb.embeds,
                                    qb.kv_valid)
            return dec.decoder_logits(vp["decoder"], vcfg.decoder, h)

        pre_loc = jax.lax.stop_gradient(fwd(vparams, locs))
        pre_extra = {k: jax.lax.stop_gradient(fwd(vparams, qb))
                     for k, qb in extras.items()}

        def loss_fn(params):
            deltas = self._transform(params, norm_state, captured)
            vp = self._edited_vparams(
                vparams, {k: v[0] for k, v in deltas.items()})
            logs = {}
            # reliability (token-mean over the batch, mend_vl.py:315-318)
            rel_logits = fwd(vp, rel)
            nll, cnt = per_row_ce(rel_logits, rel)
            rel_loss = cfg.relia_lambda * nll.sum() / jnp.maximum(cnt.sum(), 1.0)
            logs["rel_loss"] = rel_loss
            total = rel_loss
            # generality: ONE forward over [G*B] rows; per-key token-mean
            gen_logits = fwd(vp, gens)
            nll, cnt = per_row_ce(gen_logits, gens)
            g = (nll.reshape(G, B).sum(1)
                 / jnp.maximum(cnt.reshape(G, B).sum(1), 1.0))
            gen_loss = cfg.gen_lambda * g.sum()
            logs["gen_loss"] = gen_loss
            total = total + gen_loss
            # locality: ONE forward; per-key KL(pre || post) (mend_vl.py:332)
            lp1 = jax.nn.log_softmax(pre_loc, -1)
            lp2 = jax.nn.log_softmax(fwd(vp, locs), -1)
            klv = (jnp.exp(lp1) * (lp1 - lp2)).sum(-1)
            m = locs.label_masks.astype(jnp.float32)
            per_key = ((klv * m).sum(-1).reshape(K, B).sum(1)
                       / jnp.maximum(m.sum(-1).reshape(K, B).sum(1), 1.0))
            loc_loss = cfg.loc_lambda * per_key.sum()
            logs["loc_loss"] = loc_loss
            total = total + loc_loss
            # DE-VQA analysis loss variants (MultimodalTrainer.py:585-738)
            if extras:
                from ..train.loss_variants import variant_extra_losses

                post_extra = {k: fwd(vp, qb) for k, qb in extras.items()}
                img_re = gen_logits.reshape(
                    (G, B) + gen_logits.shape[1:])[GI_IMG]
                extra = variant_extra_losses(
                    cfg.train_loss_variant, vcfg.vt_range,
                    pre_extra, post_extra,
                    {k: qb.kv_valid for k, qb in extras.items()},
                    inner_logits=rel_logits,
                    image_rephrase_logits=img_re)
                for k, v in extra.items():
                    logs[k] = v
                    total = total + v
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self._opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logs

    def train_init_editor(self, seed: int):
        self.params = self._init_params(seed)
        for s in self.shapes:
            self.norm_state[str(s)] = init_gt_norm_state(*s)
        cfg = self.cfg

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "lrs" if getattr(path[0], "key", "") == "edit_lrs"
                else "aux", params)

        # The reference clips the grad norm over the AUX params only
        # (clip_grad_norm_(self.aux_models.parameters(), 100.),
        # mend_vl.py:337-338) — edit_lrs grads reach Adam unclipped, and
        # the clip norm excludes them. multi_transform masks the subtree,
        # so the inner clip sees exactly the aux grads.
        self._opt = optax.multi_transform(
            {"aux": optax.chain(optax.clip_by_global_norm(100.0),
                                optax.adam(cfg.aux_model.lr)),
             "lrs": optax.adam(cfg.edit_lr_lr)}, label_fn)
        self._opt_state = self._opt.init(self.params)

    def get_train_state(self):
        return {"params": self.params, "opt_state": self._opt_state,
                "norm_state": self.norm_state}

    def reseed_host(self, seed: int):
        # resume path: no host RNG streams; device state is restored
        # by set_train_state, so nothing to do.
        pass

    def set_train_state(self, state):
        self.params = state["params"]
        self._opt_state = state["opt_state"]
        self.norm_state = state["norm_state"]
