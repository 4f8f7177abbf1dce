"""Golden test: masked fixed-shape losses == reference variable-length math.

Re-implements the reference loss assembly (model.py:62-233) in plain numpy
with true variable-length positive/negative sets (boolean indexing, like
tf.where) and GT arrays padded only to the per-batch max (like
BatchData2Biggest, run.py:62-64). The framework's masked implementation with
``pad_semantics="reference"`` must reproduce it exactly on random data.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from votenet_tpu.config import Config
from votenet_tpu.models.losses import votenet_loss


def huber(x, delta=1.0):
    a = np.abs(x)
    return np.where(a <= delta, 0.5 * x * x, delta * (a - 0.5 * delta))


def softmax_ce(logits, label):
    m = logits.max()
    z = np.exp(logits - m)
    return -np.log(z[label] / z.sum())


def roty_mat(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def reference_loss(end_points, gt_list, cfg):
    """Variable-length numpy port of model.py:62-233.

    gt_list: per-batch dict of UNPADDED arrays. Emulates the reference's
    per-batch-max edge padding before the loss math.
    """
    seeds = np.asarray(end_points["seeds_xyz"], np.float64)
    votes = np.asarray(end_points["votes_xyz"], np.float64)
    prop_xyz = np.asarray(end_points["proposals_xyz"], np.float64)
    out = np.asarray(end_points["proposals_output"], np.float64)
    B, N, _ = seeds.shape
    P = prop_xyz.shape[1]
    NH, NS, NC = cfg.num_heading_bin, cfg.num_size_cluster, cfg.num_class

    # per-batch-max edge padding (run.py:14-24,62-64)
    bbmax = max(len(g["bboxes_xyz"]) for g in gt_list)
    def pad(a):
        a = np.asarray(a, np.float64)
        if len(a) < bbmax:
            a = np.concatenate([a, np.repeat(a[-1:], bbmax - len(a), axis=0)])
        return a
    bb_xyz = np.stack([pad(g["bboxes_xyz"]) for g in gt_list])
    bb_lwh = np.stack([pad(g["bboxes_lwh"]) for g in gt_list])
    bb_rot = np.stack([pad(g["bboxes_roty"]) for g in gt_list])
    sem = np.stack([pad(g["semantic_labels"]) for g in gt_list]).astype(int)
    hl = np.stack([pad(g["heading_labels"]) for g in gt_list]).astype(int)
    hr = np.stack([pad(g["heading_residuals"]) for g in gt_list])
    sl = np.stack([pad(g["size_labels"]) for g in gt_list]).astype(int)
    sr = np.stack([pad(g["size_residuals"]) for g in gt_list])

    # vote loss (model.py:62-84)
    vote_terms = []
    for b in range(B):
        for n in range(N):
            diffs = np.abs(seeds[b, n] - bb_xyz[b])  # (BB, 3)
            inside_any = False
            for j in range(bbmax):
                rot = roty_mat(-bb_rot[b, j]) @ diffs[j]
                if np.all(rot < bb_lwh[b, j] / 2.0):
                    inside_any = True
            assign = np.argmin(np.linalg.norm(diffs, axis=-1))
            l1 = np.abs(votes[b, n] - bb_xyz[b, assign]).sum()
            vote_terms.append(l1 * float(inside_any))
    vote_reg_loss = np.mean(vote_terms)

    # proposal assignment (model.py:148-155)
    dist = np.linalg.norm(
        prop_xyz[:, :, None, :] - bb_xyz[:, None, :, :], axis=-1
    )  # (B, P, BB)
    assign = np.argmin(dist, axis=-1)
    mind = dist.min(axis=-1)
    pos = mind < cfg.positive_thres
    neg = mind > cfg.negative_thres

    # objectness
    pos_ce = [softmax_ce(out[b, p, 0:2], 1) for b in range(B) for p in range(P) if pos[b, p]]
    neg_ce = [softmax_ce(out[b, p, 0:2], 0) for b in range(B) for p in range(P) if neg[b, p]]
    obj_cls_loss = np.mean(pos_ce) + np.mean(neg_ce)

    # center (positives) + dual chamfer
    c_main = []
    for b in range(B):
        for p in range(P):
            if pos[b, p]:
                delta_gt = bb_xyz[b, assign[b, p]] - prop_xyz[b, p]
                c_main.append(huber(out[b, p, 2:5] - delta_gt).sum())
    dual = []
    for b in range(B):
        for j in range(bbmax):
            pstar = np.argmin(dist[b, :, j])
            delta_gt = bb_xyz[b, j] - prop_xyz[b, pstar]
            dual.append(huber(out[b, pstar, 2:5] - delta_gt).sum())
    center_loss = np.mean(c_main) + np.mean(dual)

    # heading / size / semantic over positives
    h_ce, h_res, s_ce, s_res, m_ce = [], [], [], [], []
    for b in range(B):
        for p in range(P):
            if not pos[b, p]:
                continue
            j = assign[b, p]
            h_ce.append(softmax_ce(out[b, p, 5 : 5 + NH], hl[b, j]))
            h_res.append(huber(out[b, p, 5 + NH + hl[b, j]] - hr[b, j]))
            s_ce.append(softmax_ce(out[b, p, 5 + 2 * NH : 5 + 2 * NH + NS], sl[b, j]))
            res_pred = out[b, p, 5 + 2 * NH + NS : 5 + 2 * NH + 4 * NS].reshape(NS, 3)
            s_res.append(huber(res_pred[sl[b, j]] - sr[b, j]).sum())
            m_ce.append(softmax_ce(out[b, p, -NC:], sem[b, j]))
    box_loss = (
        center_loss
        + 0.1 * np.mean(h_ce)
        + np.mean(h_res)
        + 0.1 * np.mean(s_ce)
        + np.mean(s_res)
    )
    total = vote_reg_loss + 0.5 * obj_cls_loss + 1.0 * box_loss + 0.1 * np.mean(m_ce)
    return {
        "total": total,
        "vote_reg_loss": vote_reg_loss,
        "obj_cls_loss": obj_cls_loss,
        "center_loss": center_loss,
        "box_loss": box_loss,
        "sem_cls_loss": np.mean(m_ce),
    }


class TestLossParity:
    def test_masked_equals_variable_length(self, rng):
        cfg = Config(
            point_num=64, max_gt_boxes=6, proposal_num=12,
            num_heading_bin=12, num_size_cluster=10, num_class=10,
        )
        B, N, P, G = 2, 20, cfg.proposal_num, cfg.max_gt_boxes
        counts = [2, 4]

        gt_centers = [(rng.randn(c, 3) * 0.8).astype(np.float32) for c in counts]
        # proposals: half near GT centers (positives, < 0.3), half far (> 0.6)
        proposals = np.zeros((B, P, 3), np.float32)
        for b, c in enumerate(counts):
            for p in range(P):
                if p < P // 2:
                    j = p % c
                    proposals[b, p] = gt_centers[b][j] + rng.uniform(-0.1, 0.1, 3)
                else:
                    proposals[b, p] = gt_centers[b][p % c] + rng.uniform(2.0, 3.0, 3)

        end_points = {
            "seeds_xyz": rng.randn(B, N, 3).astype(np.float32),
            "votes_xyz": rng.randn(B, N, 3).astype(np.float32),
            "proposals_xyz": proposals,
            "proposals_output": rng.randn(B, P, cfg.num_proposal_channels).astype(np.float32),
        }
        gt_list = []
        for b, c in enumerate(counts):
            gt_list.append({
                "bboxes_xyz": gt_centers[b],
                "bboxes_lwh": rng.uniform(0.5, 2, (c, 3)).astype(np.float32),
                "bboxes_roty": rng.uniform(0, 2 * np.pi, c).astype(np.float32),
                "semantic_labels": rng.randint(0, cfg.num_class, c),
                "heading_labels": rng.randint(0, cfg.num_heading_bin, c),
                "heading_residuals": (rng.randn(c) * 0.3).astype(np.float32),
                "size_labels": rng.randint(0, cfg.num_size_cluster, c),
                "size_residuals": (rng.randn(c, 3) * 0.2).astype(np.float32),
            })

        want = reference_loss(end_points, gt_list, cfg)

        # static-shape edge padding to max_gt_boxes + gt_count
        def pad_to_G(a):
            a = np.asarray(a)
            sel = np.minimum(np.arange(G), len(a) - 1)
            return a[sel]
        gt = {
            "bboxes_xyz": jnp.asarray(np.stack([pad_to_G(g["bboxes_xyz"]) for g in gt_list])),
            "bboxes_lwh": jnp.asarray(np.stack([pad_to_G(g["bboxes_lwh"]) for g in gt_list])),
            "bboxes_roty": jnp.asarray(np.stack([pad_to_G(g["bboxes_roty"]) for g in gt_list])),
            "semantic_labels": jnp.asarray(np.stack([pad_to_G(g["semantic_labels"]) for g in gt_list]), jnp.int32),
            "heading_labels": jnp.asarray(np.stack([pad_to_G(g["heading_labels"]) for g in gt_list]), jnp.int32),
            "heading_residuals": jnp.asarray(np.stack([pad_to_G(g["heading_residuals"]) for g in gt_list])),
            "size_labels": jnp.asarray(np.stack([pad_to_G(g["size_labels"]) for g in gt_list]), jnp.int32),
            "size_residuals": jnp.asarray(np.stack([pad_to_G(g["size_residuals"]) for g in gt_list])),
            "gt_count": jnp.asarray(counts, jnp.int32),
        }
        ep = {k: jnp.asarray(v) for k, v in end_points.items()}
        got = votenet_loss(ep, gt, cfg, pad_semantics="reference")

        np.testing.assert_allclose(float(got.vote_reg_loss), want["vote_reg_loss"], rtol=2e-4)
        np.testing.assert_allclose(float(got.obj_cls_loss), want["obj_cls_loss"], rtol=2e-4)
        np.testing.assert_allclose(float(got.center_loss), want["center_loss"], rtol=2e-4)
        np.testing.assert_allclose(float(got.box_loss), want["box_loss"], rtol=2e-4)
        np.testing.assert_allclose(float(got.sem_cls_loss), want["sem_cls_loss"], rtol=2e-4)
        np.testing.assert_allclose(float(got.total), want["total"], rtol=2e-4)


class TestEmptySelectionSets:
    """Documented deviation: empty positive/negative sets yield finite 0
    terms where the reference's reduce_mean-of-empty yields NaN
    (model.py:162). See the losses.py module docstring."""

    def _make_inputs(self, rng, proposal_offset):
        cfg = Config(
            point_num=64, max_gt_boxes=4, proposal_num=8,
            num_heading_bin=12, num_size_cluster=10, num_class=10,
        )
        B, N, P, G = 2, 10, cfg.proposal_num, cfg.max_gt_boxes
        gt_centers = (rng.randn(B, G, 3) * 0.5).astype(np.float32)
        # place every proposal at a fixed offset from its assigned GT center
        proposals = (
            gt_centers[:, np.arange(P) % G] + proposal_offset
        ).astype(np.float32)
        end_points = {
            "seeds_xyz": rng.randn(B, N, 3).astype(np.float32),
            "votes_xyz": rng.randn(B, N, 3).astype(np.float32),
            "proposals_xyz": jnp.asarray(proposals),
            "proposals_output": jnp.asarray(
                rng.randn(B, P, cfg.num_proposal_channels).astype(np.float32)
            ),
        }
        gt = {
            "bboxes_xyz": jnp.asarray(gt_centers),
            "bboxes_lwh": jnp.asarray(rng.uniform(0.5, 2, (B, G, 3)).astype(np.float32)),
            "bboxes_roty": jnp.asarray(rng.uniform(0, 6.28, (B, G)).astype(np.float32)),
            "semantic_labels": jnp.asarray(rng.randint(0, 10, (B, G)), jnp.int32),
            "heading_labels": jnp.asarray(rng.randint(0, 12, (B, G)), jnp.int32),
            "heading_residuals": jnp.asarray((rng.randn(B, G) * 0.3).astype(np.float32)),
            "size_labels": jnp.asarray(rng.randint(0, 10, (B, G)), jnp.int32),
            "size_residuals": jnp.asarray((rng.randn(B, G, 3) * 0.2).astype(np.float32)),
            "gt_count": jnp.full((B,), G, jnp.int32),
        }
        ep = {k: jnp.asarray(v) for k, v in end_points.items()}
        return cfg, ep, gt

    def test_zero_positives_finite(self, rng):
        # every proposal is ~5m from every GT center: no positives (<0.3),
        # all negatives (>0.6)
        cfg, ep, gt = self._make_inputs(rng, proposal_offset=np.array([5.0, 0, 0]))
        out = votenet_loss(ep, gt, cfg, pad_semantics="reference")
        for name, v in out._asdict().items():
            assert np.isfinite(float(v)), f"{name} not finite with 0 positives"
        # positive-masked terms collapse to 0, not NaN (center_loss stays
        # positive through its dual chamfer term, which ignores positives —
        # model.py:175-182)
        assert float(out.sem_cls_loss) == 0.0
        assert int(out.num_positive) == 0

    def test_zero_negatives_finite(self, rng):
        # every proposal sits 0.05m from a GT center: all positives, no
        # negatives (nothing in the >0.6 band)
        cfg, ep, gt = self._make_inputs(rng, proposal_offset=np.array([0.05, 0, 0]))
        out = votenet_loss(ep, gt, cfg, pad_semantics="reference")
        for name, v in out._asdict().items():
            assert np.isfinite(float(v)), f"{name} not finite with 0 negatives"
        assert float(out.center_loss) > 0.0
