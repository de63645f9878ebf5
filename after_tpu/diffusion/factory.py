"""Model-class selection: the reference's `after train --model
{rectified,edm}` switch (after_scripts/train.py:88-95).  Unlike the
reference — whose `edm` branch imports a class that does not exist
(SURVEY §2.5) — both choices work here."""

from __future__ import annotations

from .rectified_flow import RectifiedFlow


def make_model(cfg) -> RectifiedFlow:
    """Build the diffusion model for `cfg.diffusion_type`."""
    kind = getattr(cfg, "diffusion_type", "rectified") or "rectified"
    if kind == "edm":
        from .edm import EDM
        return EDM(cfg)
    if kind == "rectified":
        return RectifiedFlow(cfg)
    raise ValueError(f"unknown diffusion_type {kind!r} "
                     "(expected 'rectified' or 'edm')")
