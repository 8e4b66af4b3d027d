"""Data (inverse) scalers for positions / atom types / charges / edges.

Functional port of the reference normalizers (utils.py:33-105): divide each
channel group by its normalize factor, optionally recenter one-hots from
{0,1} to {-1,1}. Works on dense [B,N,*] / [B,N,N,E] tensors with [B,N] and
[B,N,N] masks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax.numpy as jnp

__all__ = ["DataScaler", "parse_normalize_factors"]


def parse_normalize_factors(nf: Union[str, Sequence[float]]):
    if isinstance(nf, str):
        factors = [int(x) for x in nf.split(",")]
    else:
        factors = list(nf)
    if len(factors) == 3:
        factors = factors + [1]
    pos_norm, atom_norm, fc_norm, edge_norm = factors
    return float(pos_norm), float(atom_norm), float(fc_norm), float(edge_norm)


@dataclasses.dataclass(frozen=True)
class DataScaler:
    """Forward/inverse normalisation, jit-safe."""

    pos_norm: float = 1.0
    atom_norm: float = 4.0
    fc_norm: float = 4.0
    edge_norm: float = 1.0
    centered: bool = True

    @staticmethod
    def from_config(config) -> "DataScaler":
        p, a, f, e = parse_normalize_factors(config.model.normalize_factors)
        return DataScaler(p, a, f, e, centered=config.data.centered)

    def scale(
        self,
        pos: Optional[jnp.ndarray],
        atom_type: jnp.ndarray,
        fc_charge: jnp.ndarray,
        node_mask: jnp.ndarray,
        edge_type: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ):
        nm = node_mask[..., None]
        if self.centered:
            atom_type = atom_type * 2.0 - 1.0
        if pos is not None:
            pos = pos / self.pos_norm * nm
        atom_type = atom_type / self.atom_norm * nm
        fc_charge = fc_charge / self.fc_norm * nm
        if edge_type is not None:
            if self.centered:
                edge_type = edge_type * 2.0 - 1.0
            edge_type = edge_type / self.edge_norm * edge_mask[..., None]
            return pos, atom_type, fc_charge, edge_type
        return pos, atom_type, fc_charge

    def inverse(
        self,
        pos: Optional[jnp.ndarray],
        atom_type: jnp.ndarray,
        fc_charge: jnp.ndarray,
        node_mask: jnp.ndarray,
        edge_type: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ):
        nm = node_mask[..., None]
        if pos is not None:
            pos = pos * self.pos_norm * nm
        atom_type = atom_type * self.atom_norm
        fc_charge = fc_charge * self.fc_norm * nm
        if self.centered:
            atom_type = (atom_type + 1.0) / 2.0 * nm
        if edge_type is not None:
            edge_type = edge_type * self.edge_norm
            if self.centered:
                edge_type = (edge_type + 1.0) / 2.0
            edge_type = edge_type * edge_mask[..., None]
            return pos, atom_type, fc_charge, edge_type
        return pos, atom_type, fc_charge
