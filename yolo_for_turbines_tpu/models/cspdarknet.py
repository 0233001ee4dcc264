"""CSPDarknet-53 backbone variant (the reference README's future-work goal,
reference: README.md:40).

Cross-Stage-Partial stages (CSPNet, arXiv:1911.11929 as used by YOLOv4): each
downsample stage splits the feature map into two 1x1-projected branches; one
branch runs the residual stack, then both are concatenated and fused by a 1x1
conv. This cuts the residual-stack FLOPs roughly in half while improving
gradient diversity.

The stage is a first-class plan entry (PlanCSP) so the same declarative DSL,
init/apply/fold machinery, and darknet-binary importer traversal work
unchanged. The neck/heads are identical to plain YOLOv3: each CSP stage
outputs the same channel count as the darknet stage it replaces, and routes
are still saved at the two 8-block stages.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax


@dataclasses.dataclass(frozen=True)
class PlanCSP:
    """One CSP stage operating at `channels` (post-downsample width).

    first_stage=True keeps full-width branches (YOLOv4's stem stage); later
    stages use half-width branches.
    """

    channels: int
    num_blocks: int
    save_route: bool = False
    first_stage: bool = False

    @property
    def branch_ch(self) -> int:
        return self.channels if self.first_stage else self.channels // 2

    @property
    def hidden_ch(self) -> int:
        return self.channels // 2


# Same downsample/stage skeleton as Darknet-53, with ("C", n) CSP stages in
# place of ("B", n) residual stacks. Neck/head entries are unchanged so the
# three-scale output contract is preserved.
CSP_LAYER_CONFIG = (
    (32, 3, 1),
    (64, 3, 2),
    ("C", 1),
    (128, 3, 2),
    ("C", 2),
    (256, 3, 2),
    ("C", 8),  # route to detection head
    (512, 3, 2),
    ("C", 8),  # route to detection head
    (1024, 3, 2),
    ("C", 4),
    (512, 1, 1),
    (1024, 3, 1),
    "S",
    (256, 1, 1),
    "U",
    (256, 1, 1),
    (512, 3, 1),
    "S",
    (128, 1, 1),
    "U",
    (128, 1, 1),
    (256, 3, 1),
    "S",
)


def init_csp_entry(rng, entry: PlanCSP):
    from .blocks import init_conv

    bc, hc, c = entry.branch_ch, entry.hidden_ch, entry.channels
    n_keys = 4 + 2 * entry.num_blocks
    keys = jax.random.split(rng, n_keys)
    p_split1, s_split1 = init_conv(keys[0], c, bc, 1)
    p_split2, s_split2 = init_conv(keys[1], c, bc, 1)
    blocks_p, blocks_s = [], []
    for b in range(entry.num_blocks):
        p1, s1 = init_conv(keys[2 + 2 * b], bc, hc, 1)
        p2, s2 = init_conv(keys[3 + 2 * b], hc, bc, 3)
        blocks_p.append({"conv1": p1, "conv2": p2})
        blocks_s.append({"conv1": s1, "conv2": s2})
    p_trans, s_trans = init_conv(keys[-2], bc, bc, 1)
    p_fuse, s_fuse = init_conv(keys[-1], 2 * bc, c, 1)
    params = {
        "split1": p_split1,
        "split2": p_split2,
        "blocks": blocks_p,
        "transition": p_trans,
        "fuse": p_fuse,
    }
    stats = {
        "split1": s_split1,
        "split2": s_split2,
        "blocks": blocks_s,
        "transition": s_trans,
        "fuse": s_fuse,
    }
    return params, stats


def apply_csp_entry(entry: PlanCSP, p: Dict, s: Dict, x, conv):
    """Run one CSP stage. `conv(p, s, x, kernel, stride)` is the caller's
    conv+BN+act closure; returns (y, new_stats)."""
    ns: Dict = {}
    shortcut, ns["split1"] = _c(conv, p["split1"], s["split1"], x, 1)
    y, ns["split2"] = _c(conv, p["split2"], s["split2"], x, 1)
    ns_blocks = []
    for bp, bs in zip(p["blocks"], s["blocks"]):
        h, ns1 = _c(conv, bp["conv1"], bs["conv1"], y, 1)
        h, ns2 = _c(conv, bp["conv2"], bs["conv2"], h, 3)
        y = y + h
        ns_blocks.append({"conv1": ns1, "conv2": ns2})
    ns["blocks"] = ns_blocks
    y, ns["transition"] = _c(conv, p["transition"], s["transition"], y, 1)
    import jax.numpy as jnp

    merged = jnp.concatenate([y, shortcut], axis=-1)
    out, ns["fuse"] = _c(conv, p["fuse"], s["fuse"], merged, 1)
    return out, ns


def _c(conv, p, s, x, kernel):
    return conv(p, s, x, kernel, 1)


def fold_csp_entry(entry: PlanCSP, p: Dict, s: Dict, fold):
    return {
        "split1": fold(p["split1"], s["split1"]),
        "split2": fold(p["split2"], s["split2"]),
        "blocks": [
            {
                "conv1": fold(bp["conv1"], bs["conv1"]),
                "conv2": fold(bp["conv2"], bs["conv2"]),
            }
            for bp, bs in zip(p["blocks"], s["blocks"])
        ],
        "transition": fold(p["transition"], s["transition"]),
        "fuse": fold(p["fuse"], s["fuse"]),
    }


def apply_csp_inference(entry: PlanCSP, p: Dict, x, conv):
    """Folded-BN inference path. `conv(p, x, kernel, stride)` applies
    conv+bias+act."""
    import jax.numpy as jnp

    shortcut = conv(p["split1"], x, 1, 1)
    y = conv(p["split2"], x, 1, 1)
    for bp in p["blocks"]:
        h = conv(bp["conv1"], y, 1, 1)
        h = conv(bp["conv2"], h, 3, 1)
        y = y + h
    y = conv(p["transition"], y, 1, 1)
    return conv(p["fuse"], jnp.concatenate([y, shortcut], axis=-1), 1, 1)
