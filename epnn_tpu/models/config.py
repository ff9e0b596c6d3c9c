"""Model configuration and named presets.

The reference hard-codes hyperparameters in two ``__main__`` blocks
(``charge_gn.py:413-425``, ``infer.py:38-50``); here they live in one frozen
dataclass.  The three shipped checkpoints map to the presets below
(SURVEY §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class EPNNConfig:
    """Architecture hyperparameters.

    Attributes:
      n_elems: per-atom feature width ([Z, onehot]; 10 → 9-element table,
        9 → 8-element table, SURVEY §8 Q5).
      h_dim: hidden-state width (reference h_dim=48).
      e_dim: RBF edge channels (reference e_dim=48).
      msg_dim: message width (reference hard-codes 32, charge_gn.py:52).
      mlp_hidden: hidden widths of every MLP (reference [32, 32]).
      T: rounds of message passing AND of electron passing.
      cutoff / eta: RBF physics constants (charge_gn.py:122).
      mask_messages: pairwise-mask GNN messages (clean default).  The
        reference does NOT mask them (charge_gn.py:70, SURVEY §8 Q10), so its
        predictions depend on the padded width; set False for golden parity.
      pass_weighting: 'hard_gate' multiplies electron passing by the
        is-near indicator (charge_gn.py:90-94,116); 'soft_envelope' uses the
        cosine-cutoff envelope instead (the shipped 'decay_model' variant,
        SURVEY §8 Q13).
      is_near_tol: the gate tolerance (charge_gn.py:90).
    """

    n_elems: int = 10
    h_dim: int = 48
    e_dim: int = 48
    msg_dim: int = 32
    mlp_hidden: Tuple[int, ...] = (32, 32)
    T: int = 5
    cutoff: float = 3.0
    eta: float = 2.0
    mask_messages: bool = True
    pass_weighting: str = "hard_gate"
    is_near_tol: float = 1e-5
    compute_dtype: str = "float32"   # 'float32' | 'bfloat16'
    highest_precision: bool = True   # fp32-highest matmuls (parity-safe)
    matmul_precision: str = ""       # '' (use highest_precision) | 'default'
                                     # | 'high' (bf16x3) | 'highest' (bf16x6)
    #: mixed-precision policy for the far-field (no-feature) dense message
    #: reduction only — the O(N²) term of the neighbor-split path.  '' uses
    #: matmul_precision; 'bf16x3' runs a manual hi/lo split-float matmul
    #: (three default-precision MXU passes ≈ fp32 accuracy; XLA's own
    #: Precision.HIGH is pathologically slow on v5e); 'int8' quantizes the
    #: far-field mid matmul in the packed Pallas kernel (per-row activation
    #: / per-column weight scales, ~1% relative tier — serving fast mode;
    #: requires use_pallas on TPU, conservation unaffected: message-term
    #: numerics never touch the antisymmetric pass rounds).  The near-field
    #: and electron-passing math keeps the main precision.
    dense_matmul_precision: str = ""

    @property
    def atom_feat_dim(self) -> int:
        """Width of the per-atom pair-input slice: [x, h, q]."""
        return self.n_elems + self.h_dim + 1

    @property
    def pair_feat_dim(self) -> int:
        """Width of a pair-MLP input row: [a_i, a_j, e_ij]."""
        return 2 * self.atom_feat_dim + self.e_dim

    def replace(self, **kw) -> "EPNNConfig":
        return dataclasses.replace(self, **kw)


def reference_compat(cfg: EPNNConfig) -> EPNNConfig:
    """Flip the quirk switches to bit-follow the reference semantics."""
    return cfg.replace(mask_messages=False)


#: Presets matching the three shipped checkpoints (SURVEY §2.5).  The
#: reference-named presets carry ``mask_messages=False`` — the exact
#: semantics the checkpoints were trained with (unmasked GNN message sums,
#: SURVEY §8 Q10) and what tf_import infers — so a config built from the
#: preset matches one built from the checkpoint.  The ``*_clean`` variants
#: are the same architectures with pairwise-masked messages (the
#: padding-width-independent default for training new models).
PRESETS = {
    # charge_gn.py __main__ — 9-element table + Z slot, T=5
    "model": EPNNConfig(n_elems=10, T=5, mask_messages=False),
    # smaller variant: 8-element table, T=3
    "model2": EPNNConfig(n_elems=9, T=3, mask_messages=False),
    # decay variant: 8-element table, T=5 (hard gate — resolved by parity
    # testing in tests/test_parity.py; 'decay' in the name is historical)
    "decay_model": EPNNConfig(n_elems=9, T=5, mask_messages=False),
    "model_clean": EPNNConfig(n_elems=10, T=5),
    "model2_clean": EPNNConfig(n_elems=9, T=3),
    "decay_model_clean": EPNNConfig(n_elems=9, T=5),
}
