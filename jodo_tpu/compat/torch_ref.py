"""Dense pure-torch re-expression of the reference DGT_concat forward.

Purpose: an egress-free numerical-parity oracle (SURVEY §7 "hard
correctness gate", VERDICT r1 item 3). The reference forward
(/root/reference/models/mol_gnn.py:491-594) uses PyTorch-Geometric only
for segment softmax / scatter over *fully-connected* per-molecule graphs;
over a dense symmetric edge mask those are exactly a masked dense softmax
and a masked sum. This module recomputes the reference semantics with
dense [B,N,...] tensors and the reference's own state_dict — no PyG — so
`tests/test_parity.py` can diff it layer-by-layer against the flax DGT
with the same (converted) weights.

Semantics mirrored (file:line of the reference):
  * TransMixLayer logits/gates/softmax     models/layers.py:160-186
  * extra adjacency heads, -1e10 sentinel  models/layers.py:169-176
  * EquivariantMixBlock adaLN/FFN wiring   models/mol_gnn.py:277-322
  * MultiCondEquiUpdate coordinate update  models/mol_gnn.py:51-94
  * CondGaussianLayer / LearnedSinusodial  models/layers.py:273-334
  * DGT_concat top-level flow              models/mol_gnn.py:491-594
  * DGT_concat_2D (variant="2d"): EquivariantMixBlock_2D blocks, no
    position/distance path                 models/mol_gnn.py:325-407,797-946
  * DGT_concat_sim (variant="sim"): Trans_Layer attention (no extra
    heads), CondEquiUpdate single gate     models/mol_gnn.py:16-48,97-210,949-1124

This is NOT part of the TPU compute path — torch, CPU, test/verification
only.
"""

from __future__ import annotations

import math
from typing import Dict, Optional


def dense_dgt_forward(
    sd: Dict,
    config,
    t,
    xh,
    node_mask,
    edge_mask,
    edge_x,
    noise_level,
    cond_x=None,
    cond_edge_x=None,
    collect: Optional[dict] = None,
    variant: str = "joint",
):
    """Reference-semantics forward on dense tensors.

    sd: reference-format state_dict (torch tensors, no 'module.' prefix)
    t [B], xh [B,N,3+C], node_mask [B,N], edge_mask [B,N,N] (no diagonal),
    edge_x [B,N,N,E], noise_level [B]. Returns (pred, edge_pred); when
    `collect` is a dict, per-layer activations are stored into it under
    keys 'h_i' / 'edge_i' / 'pos_i'.
    """
    import torch
    import torch.nn.functional as F

    m = config.model
    hidden = int(m.nf)
    edge_hidden = hidden // 4
    heads = int(m.n_heads)
    extra = 0 if variant == "sim" else int(m.n_extra_heads)
    sub_heads = heads - extra
    out_ch = hidden // heads
    sub_ch = (heads * out_ch) // sub_heads
    dist_dim = edge_hidden if bool(m.dist_gbf) else 1
    n_layers = int(m.n_layers)
    in_node_dim = int(config.data.atom_types) + int(m.include_fc_charge)

    sd = {k.removeprefix("module."): torch.as_tensor(v) for k, v in sd.items()}

    def lin(name, x):
        w = sd[f"{name}.weight"]
        y = x @ w.T
        b = sd.get(f"{name}.bias")
        return y + b if b is not None else y

    def ln(x):
        # nn.LayerNorm(elementwise_affine=False, eps=1e-6)
        return F.layer_norm(x, x.shape[-1:], eps=1e-6)

    def gaussian(x, mean, std):
        a = (2 * 3.14159) ** 0.5
        return torch.exp(-0.5 * (((x - mean) / std) ** 2)) / (a * std)

    def gbf(prefix, x, time_emb):
        """CondGaussianLayer on [B,N,N,1] with per-graph time modulation."""
        if f"{prefix}.time_mlp.1.weight" in sd and time_emb is not None:
            ss = lin(f"{prefix}.time_mlp.1", F.silu(time_emb))  # [B,2]
            scale, shift = ss.chunk(2, dim=1)
            x = x * (scale[:, None, None, :] + 1) + shift[:, None, None, :]
        mean = sd[f"{prefix}.means.weight"].float().view(-1)
        std = sd[f"{prefix}.stds.weight"].float().view(-1).abs() + 1e-5
        return torch.cat([x, gaussian(x, mean, std)], dim=-1)

    def modulate(x, shift, scale, pair=False):
        if pair:
            return x * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
        return x * (1 + scale[:, None, :]) + shift[:, None, :]

    def attention(blk, h, edge_attr, extra_adj):
        """TransMixLayer over the dense mask (models/layers.py:131-186)."""
        b, n = h.shape[0], h.shape[1]
        q = lin(f"{blk}.attn_mpnn.lin_query", h).view(b, n, sub_heads, sub_ch)
        k = lin(f"{blk}.attn_mpnn.lin_key", h).view(b, n, sub_heads, sub_ch)
        v = lin(f"{blk}.attn_mpnn.lin_value", h).view(b, n, heads, out_ch)
        ea = torch.tanh(lin(f"{blk}.attn_mpnn.lin_edge0", edge_attr))
        ea = ea.view(b, n, n, sub_heads, sub_ch)
        ev = torch.tanh(lin(f"{blk}.attn_mpnn.lin_edge1", edge_attr))
        ev = ev.view(b, n, n, heads, out_ch)

        # logits for target i over neighbours j
        alpha_sub = torch.einsum("bihc,bjhc,bijhc->bijh", q, k, ea) / math.sqrt(
            out_ch
        )
        if extra_adj is None:  # Trans_Layer (models/layers.py:13-89)
            logits = alpha_sub
        else:
            ex = extra_adj
            if bool(m.softmax_inf):
                ex = torch.where(ex == 0.0, torch.full_like(ex, -1e10), ex)
            logits = torch.cat([ex, alpha_sub], dim=-1)  # extra heads first

        mask = edge_mask[..., None]
        logits = torch.where(mask > 0, logits, torch.full_like(logits, -1e30))
        logits = logits - logits.max(dim=2, keepdim=True).values
        unnorm = torch.exp(logits) * mask
        alpha = unnorm / unnorm.sum(dim=2, keepdim=True).clamp(min=1e-20)

        out = torch.einsum("bijh,bjhc,bijhc->bihc", alpha, v, ev)
        return out.reshape(b, n, heads * out_ch)

    def equi_update(blk, h, pos, edge_attr, dist, time_emb, extra_adj):
        """MultiCondEquiUpdate (models/mol_gnn.py:51-94), dense."""
        eq = f"{blk}.equi_update"
        b, n = pos.shape[0], pos.shape[1]
        inp = torch.cat(
            [
                h[:, :, None, :].expand(b, n, n, hidden),
                h[:, None, :, :].expand(b, n, n, hidden),
                edge_attr,
                dist,
            ],
            dim=-1,
        )
        coord_diff = pos[:, :, None, :] - pos[:, None, :, :]
        norm = coord_diff.norm(dim=-1, keepdim=True).clamp(min=1e-8)
        coord_diff = coord_diff / norm * sd[f"{eq}.coord_norm.scale"]

        inv = ln(lin(f"{eq}.input_lin", inp))
        if time_emb is not None:
            ss = lin(f"{eq}.time_mlp.1", F.silu(time_emb))
            shift, scale = ss.chunk(2, dim=1)
            inv = modulate(inv, shift, scale, pair=True)
        inv = lin(f"{eq}.coord_mlp.0", inv)
        inv = F.silu(inv)
        inv = torch.tanh(lin(f"{eq}.coord_mlp.2", inv))

        if extra_adj is None:  # CondEquiUpdate (models/mol_gnn.py:16-48)
            inv = inv.mean(-1, keepdim=True)
        else:
            adjs = torch.cat([torch.ones_like(inv[..., :1]), extra_adj],
                             dim=-1)
            inv = (inv * adjs).mean(-1, keepdim=True)
        trans = coord_diff * inv * edge_mask[..., None]
        return pos + trans.sum(dim=2)

    # ------- top-level flow (mol_gnn.py:491-594 / 797-946 / 1020-1124) -------
    b, n = xh.shape[0], xh.shape[1]
    if variant == "2d":
        pos_init = pos = None
        h = xh.clone()
    else:
        pos_init = pos = xh[:, :, 0:3].clone()
        h = xh[:, :, 3:].clone()

    if cond_x is None:
        cond_x = torch.zeros_like(xh)
        cond_edge_x = torch.zeros_like(edge_x)
        cond_adj_2d = edge_mask[..., None].clone()
    else:
        cond_adj_2d = (cond_edge_x[..., 0:1] >= float(m.edge_quan_th)).float()
        cond_adj_2d = cond_adj_2d * edge_mask[..., None]
    if variant == "2d":
        cond_pos = None
        cond_h = cond_x
    else:
        cond_pos = cond_x[:, :, 0:3]
        cond_h = cond_x[:, :, 3:]
    h = torch.cat([h, cond_h], dim=-1)

    # time embedding (LearnedSinusodialposEmb: [x, sin, cos])
    x = noise_level[:, None]
    freqs = x * sd["time_mlp.0.weights"][None, :] * 2 * math.pi
    emb = torch.cat([x, freqs.sin(), freqs.cos()], dim=-1)
    time_emb = lin("time_mlp.1", emb)
    time_emb = F.gelu(time_emb)
    time_emb = lin("time_mlp.3", time_emb)

    if variant == "2d":
        # DGT_concat_2D: no position channel (mol_gnn.py:891-922)
        extra_adj = cond_adj_2d
        if extra_adj.shape[-1] != extra:
            extra_adj = extra_adj.repeat_interleave(
                extra // extra_adj.shape[-1], -1)
        edge_attr = torch.cat([edge_x, cond_edge_x], dim=-1)
    else:
        # distances + spatial adjacency from self-cond positions
        # (utils.coord2diff_adj, models/utils.py:109-118: squared distances)
        diff = cond_pos[:, :, None, :] - cond_pos[:, None, :, :]
        radial = (diff * diff).sum(-1, keepdim=True) * edge_mask[..., None]
        cond_adj_spatial = (
            (radial <= float(m.spatial_cut_off)).float() * edge_mask[..., None]
        )
        if radial.sum() == 0:
            distances = radial.repeat(1, 1, 1, dist_dim)
        elif bool(m.dist_gbf):
            distances = gbf("dist_layer", radial, time_emb)
        else:
            distances = radial
        if variant == "sim":  # DGT_concat_sim: no extra heads
            extra_adj = None
        else:
            extra_adj = torch.cat([cond_adj_2d, cond_adj_spatial], dim=-1)
            if extra_adj.shape[-1] != extra:
                extra_adj = extra_adj.repeat_interleave(
                    extra // extra_adj.shape[-1], -1)
        edge_attr = torch.cat([edge_x, cond_edge_x, distances], dim=-1)
    h = lin("node_emb", h)
    edge_attr = lin("edge_emb", edge_attr)

    atom_hids = [h]
    edge_hids = [edge_attr]
    for i in range(n_layers):
        blk = f"e_block_{i}"
        h_in, e_in = h, edge_attr

        if variant != "2d":
            # block distance feature from the *current* positions
            dd = pos[:, :, None, :] - pos[:, None, :, :]
            dist = (dd * dd).sum(-1, keepdim=True)
            if bool(m.dist_gbf):
                dist = gbf(f"{blk}.dist_layer", dist, time_emb)
            edge_attr = lin(f"{blk}.edge_emb",
                            torch.cat([dist, edge_attr], dim=-1))

        if bool(m.cond_time):
            n_mod = lin(f"{blk}.node_time_mlp.1", F.silu(time_emb))
            e_mod = lin(f"{blk}.edge_time_mlp.1", F.silu(time_emb))
            (ns_msa, nsc_msa, ng_msa, ns_mlp, nsc_mlp, ng_mlp) = n_mod.chunk(6, 1)
            (es_msa, esc_msa, eg_msa, es_mlp, esc_mlp, eg_mlp) = e_mod.chunk(6, 1)
            hh = modulate(ln(h), ns_msa, nsc_msa)
            ee = modulate(ln(edge_attr), es_msa, esc_msa, pair=True)
        else:
            hh = ln(h)
            ee = ln(edge_attr)

        h_node = attention(blk, hh, ee, extra_adj)
        h_edge = h_node[:, :, None, :] + h_node[:, None, :, :]
        h_edge = lin(f"{blk}.node2edge_lin", h_edge)

        nm = node_mask[..., None]
        if bool(m.cond_time):
            h_node = h_in + ng_msa[:, None, :] * h_node
            h_node = modulate(ln(h_node), ns_mlp, nsc_mlp) * nm
            ff = lin(f"{blk}.ff_linear2", F.silu(lin(f"{blk}.ff_linear1", h_node)))
            h = (h_node + ng_mlp[:, None, :] * ff) * nm
            h_edge = e_in + eg_msa[:, None, None, :] * h_edge
            h_edge = modulate(ln(h_edge), es_mlp, esc_mlp, pair=True)
            ffe = lin(f"{blk}.ff_linear4", F.silu(lin(f"{blk}.ff_linear3", h_edge)))
            edge_attr = h_edge + eg_mlp[:, None, None, :] * ffe
        else:
            h_node = h_in + h_node
            h_node = ln(h_node) * nm
            ff = lin(f"{blk}.ff_linear2", F.silu(lin(f"{blk}.ff_linear1", h_node)))
            h = (h_node + ff) * nm
            h_edge = e_in + h_edge
            h_edge = ln(h_edge)
            ffe = lin(f"{blk}.ff_linear4", F.silu(lin(f"{blk}.ff_linear3", h_edge)))
            edge_attr = h_edge + ffe

        if variant != "2d":
            pos = equi_update(blk, h, pos, edge_attr, dist, time_emb,
                              extra_adj)
            if bool(m.CoM):
                mean = (pos * nm).sum(1, keepdim=True) / nm.sum(1,
                                                               keepdim=True)
                pos = (pos - mean) * nm

        if collect is not None:
            collect[f"h_{i}"] = h
            collect[f"edge_{i}"] = edge_attr
            if variant != "2d":
                collect[f"pos_{i}"] = pos

        atom_hids.append(lin(f"node_{i}", h))
        edge_hids.append(lin(f"edge_{i}", edge_attr))

    atom_cat = torch.cat(atom_hids, dim=-1)
    edge_cat = torch.cat(edge_hids, dim=-1)

    def mlp3(name, x):
        x = F.silu(lin(f"{name}.0", x))
        x = F.silu(lin(f"{name}.2", x))
        return lin(f"{name}.4", x)

    atom_pred = mlp3("node_pred_mlp", atom_cat) * node_mask[..., None]
    edge_pred = torch.cat(
        [mlp3("edge_exist_mlp", edge_cat), mlp3("edge_type_mlp", edge_cat)], dim=-1
    )
    edge_pred = edge_pred * edge_mask[..., None]
    edge_pred = 0.5 * (edge_pred + edge_pred.permute(0, 2, 1, 3))

    if variant == "2d":
        return atom_pred, edge_pred

    nm = node_mask[..., None]
    if bool(m.pred_data):
        pos = pos * nm
    else:
        pos = (pos - pos_init) * nm
    mean = (pos * nm).sum(1, keepdim=True) / nm.sum(1, keepdim=True)
    pos = (pos - mean) * nm
    return torch.cat([pos, atom_pred], dim=2), edge_pred


def dense_cdgs_forward(
    sd: Dict,
    config,
    t,
    xh,
    node_mask,
    edge_mask,
    edge_x,
    collect: Optional[dict] = None,
):
    """Reference-semantics CDGS forward on dense tensors.

    Mirrors /root/reference/models/cdgs.py:201-408 (module-list indexing
    and all) with PyG replaced by dense masked ops:
      * GINEConv over the discretised adjacency   cdgs.py:39-41,116-121
        (out_i = gin_nn(x_i + sum_j adj_ji relu(x_j + e_ji)); adjacency
        and edge stream are symmetric, so the dense form is exact)
      * EdgeGateTransLayer full-graph attention   layers.py:194-270
      * get_rw_feat RW landing + SPD one-hots     cdgs.py:159-183
      * GroupNorm per-node ([B*N,C]) for node norms, spatial
        ([B,C,N,N]) for the edge norm              cdgs.py:120,134,145,148
      * conv1x1 heads as channel Denses            cdgs.py:153-156

    sd: reference-format state_dict keyed 'all_modules.<idx>.*'. Returns
    (atom_score, bond_score[B,N,N,E]); `collect` stores 'h_i'/'edge_i'.
    Torch, CPU, test/verification only — not the TPU compute path.
    """
    import torch
    import torch.nn.functional as F

    m = config.model
    nf = int(m.nf)
    n_layers = int(m.n_layers)
    heads = int(m.n_heads)
    out_ch = nf // heads
    rw_depth = int(m.rw_depth)
    groups = min(nf // 4, 32)

    sd = {k.removeprefix("module."): torch.as_tensor(v) for k, v in sd.items()}

    def lin(idx, x):
        w = sd[f"all_modules.{idx}.weight"]
        if w.ndim == 4:  # conv1x1 acting on [..., C] channels-last
            w = w[:, :, 0, 0]
        return x @ w.T + sd[f"all_modules.{idx}.bias"]

    def blk_lin(bi, name, x, bias=True):
        w = sd[f"all_modules.{bi}.{name}.weight"]
        y = x @ w.T
        return y + sd[f"all_modules.{bi}.{name}.bias"] if bias else y

    def gn(bi, name, x, spatial=False):
        w = sd[f"all_modules.{bi}.{name}.weight"]
        b = sd[f"all_modules.{bi}.{name}.bias"]
        if spatial:  # [B,N,N,C] -> torch layout [B,C,N,N]
            y = F.group_norm(x.permute(0, 3, 1, 2), groups, w, b, eps=1e-6)
            return y.permute(0, 2, 3, 1)
        lead = x.shape[:-1]
        y = F.group_norm(x.reshape(-1, x.shape[-1]), groups, w, b, eps=1e-6)
        return y.reshape(*lead, x.shape[-1])

    def timestep_embedding(ts, dim, max_positions=10000):
        half = dim // 2
        emb = math.log(max_positions) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        emb = ts.float()[:, None] * emb[None, :]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
        if dim % 2 == 1:
            emb = F.pad(emb, (0, 1))
        return emb

    b_sz, n = xh.shape[0], xh.shape[1]
    nm = node_mask[..., None]
    em = edge_mask[..., None]
    edge_exist = edge_x[..., 0:1]
    edge_cate = edge_x[..., 1:]

    mi = 0
    temb = timestep_embedding(t * 999, nf)
    if bool(m.cond_time):
        temb = lin(mi, temb); mi += 1
        temb = lin(mi, F.silu(temb)); mi += 1
    else:
        temb = None

    # discretise adjacency (cdgs.py:322-327)
    adj = (edge_exist[..., 0] >= 0.0).float() * edge_mask

    # RW landing + SPD one-hots (cdgs.py:159-183): powers AD^2..AD^{k+1}
    deg = adj.sum(-1, keepdims=True)
    ad = adj / (deg + 1e-8)
    rw_list = [ad]
    for _ in range(rw_depth):
        rw_list.append(torch.bmm(rw_list[-1], ad))
    rw_map = torch.stack(rw_list[1:], dim=1)  # [B, k, N, N]
    rw_landing = torch.diagonal(rw_map, dim1=2, dim2=3).permute(0, 2, 1)
    spd_ind = (rw_map <= 0).sum(dim=1)
    spd_onehot = F.one_hot(spd_ind, num_classes=rw_depth + 1).float()

    dense_cate = lin(mi, edge_cate) * em; mi += 1
    dense_exist = lin(mi, edge_exist) * em; mi += 1
    dense_spd = lin(mi, spd_onehot) * em; mi += 1
    dense_edge = lin(mi, torch.cat([dense_cate, dense_exist, dense_spd], dim=-1)) * em; mi += 1

    atom_degree = lin(mi, edge_x.sum(dim=2)); mi += 1
    atom_cate = lin(mi, xh); mi += 1
    x_rwl = lin(mi, rw_landing); mi += 1
    h = lin(mi, torch.cat([atom_degree, atom_cate, x_rwl], dim=-1)); mi += 1

    h_edge_stream = dense_edge
    atom_hids, bond_hids = [], []
    for i in range(n_layers):
        bi = mi; mi += 1
        h_in, e_in = h, h_edge_stream

        t_act = F.silu(temb)
        h_edge = (h_edge_stream + blk_lin(bi, "t_edge", t_act)[:, None, None, :]) * em
        hh = (h + blk_lin(bi, "t_node", t_act)[:, None, :]) * nm

        # GINE over discretised adjacency: out_i = nn(x_i + sum_j adj_ji
        # relu(x_j + e_ji)) (PyG aggregates at the edge-index column)
        msg = torch.relu(hh[:, :, None, :] + h_edge)  # [B, src, tgt, C]
        agg = (msg * adj[..., None]).sum(dim=1)  # sum over sources
        y = hh + agg  # (1+eps)*x with eps buffer = 0
        y = torch.relu(blk_lin(bi, "local_model.nn.0", y))
        h_local = blk_lin(bi, "local_model.nn.2", y) * nm
        h_local = gn(bi, "norm1_local", h_in + h_local)

        # EdgeGateTransLayer over the full off-diagonal mask
        q = blk_lin(bi, "self_attn.lin_query", hh).view(b_sz, n, heads, out_ch)
        k = blk_lin(bi, "self_attn.lin_key", hh).view(b_sz, n, heads, out_ch)
        v = blk_lin(bi, "self_attn.lin_value", hh).view(b_sz, n, heads, out_ch)
        ea = torch.tanh(blk_lin(bi, "self_attn.lin_edge0", h_edge, bias=False))
        ea = ea.view(b_sz, n, n, heads, out_ch)
        ev = torch.tanh(blk_lin(bi, "self_attn.lin_edge1", h_edge, bias=False))
        ev = ev.view(b_sz, n, n, heads, out_ch)
        # logits at target i over sources j; edge attr indexed [src, tgt]
        # == [tgt, src] on the symmetric stream
        logits = torch.einsum("bihc,bjhc,bijhc->bhij", q, k, ea) / math.sqrt(out_ch)
        logits = logits.masked_fill(edge_mask[:, None] == 0, -1e30)
        alpha = torch.softmax(logits, dim=-1)
        alpha = alpha * edge_mask[:, None]  # empty rows (padded nodes) -> 0
        h_attn = torch.einsum("bhij,bjhc,bijhc->bihc", alpha, v, ev)
        h_attn = h_attn.reshape(b_sz, n, heads * out_ch)
        h_attn = gn(bi, "norm1_attn", h_in + h_attn)

        h = (h_local + h_attn) * nm

        # edge update from the PRE-FFN node stream (cdgs.py:141)
        pair = h[:, :, None, :] + h[:, None, :, :]
        ye = torch.relu(blk_lin(bi, "ff_linear3", pair))
        ye = blk_lin(bi, "ff_linear4", ye)
        h_edge_stream = gn(bi, "norm2_edge", e_in + ye, spatial=True) * em

        # node FFN
        y = torch.relu(blk_lin(bi, "ff_linear1", h))
        y = blk_lin(bi, "ff_linear2", y)
        h = gn(bi, "norm2_node", h + y) * nm

        if collect is not None:
            collect[f"h_{i}"] = h.detach().clone()
            collect[f"edge_{i}"] = h_edge_stream.detach().clone()

        atom_hids.append(lin(mi, h)); mi += 1
        bond_hids.append(lin(mi, h_edge_stream)); mi += 1

    atom_hids = torch.cat(atom_hids, dim=-1)
    bond_hids = torch.cat(bond_hids, dim=-1)

    atom_score = F.silu(lin(mi, torch.cat([atom_cate, atom_hids], dim=-1))) * nm; mi += 1
    atom_score = F.silu(lin(mi, atom_score)); mi += 1
    atom_score = lin(mi, atom_score); mi += 1

    bond_score = F.silu(lin(mi, torch.cat([dense_cate, bond_hids], dim=-1))) * em; mi += 1
    bond_score = F.silu(lin(mi, bond_score)); mi += 1
    bond_score = lin(mi, bond_score); mi += 1

    exist_score = F.silu(lin(mi, torch.cat([dense_exist, bond_hids], dim=-1))) * em; mi += 1
    exist_score = F.silu(lin(mi, exist_score)); mi += 1
    exist_score = lin(mi, exist_score); mi += 1

    score = torch.cat([exist_score, bond_score], dim=-1)
    score = 0.5 * (score + score.transpose(1, 2))
    return atom_score * nm, score * em
