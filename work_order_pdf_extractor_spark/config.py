"""Job configuration store (SURVEY §2.1 S3/S9).

The reference persists settings in ``config.json`` with code-side defaults
(``load_settings`` ``work_order_extractor.py:925-946``, ``save_settings``
``:948-974``, defaults ``:62-73``, crop box as 0-1 fractions ``:65-68``).
Here the same store is a frozen dataclass: defaults in code, JSON
round-trip for persistence, unknown keys ignored on load (the reference
merges loaded keys over defaults), and the crop box folds into the
extraction plan as constants (Catalyst constant folding — SURVEY §4 O9).
"""

from __future__ import annotations

import dataclasses
import json
import os

from .core.pdfparse import DEFAULT_CROP


@dataclasses.dataclass(frozen=True)
class JobConfig:
    # crop box fractions, image space (reference defaults :65-68)
    crop_x1: float = DEFAULT_CROP[0]
    crop_y1: float = DEFAULT_CROP[1]
    crop_x2: float = DEFAULT_CROP[2]
    crop_y2: float = DEFAULT_CROP[3]
    # partitioning / skew
    n_buckets: int = 64
    whale_threshold: int = 1000
    n_salts: int = 16
    # split toggle (reference :72)
    split_pages: bool = False

    @property
    def crop(self) -> tuple[float, float, float, float]:
        return (self.crop_x1, self.crop_y1, self.crop_x2, self.crop_y2)


def load_config(path: str) -> JobConfig:
    """Defaults merged under whatever the JSON provides; unknown keys are
    dropped (reference behavior: merge over defaults, :941-944)."""
    if not os.path.exists(path):
        return JobConfig()
    with open(path) as f:
        raw = json.load(f)
    known = {f.name for f in dataclasses.fields(JobConfig)}
    return JobConfig(**{k: v for k, v in raw.items() if k in known})


def save_config(cfg: JobConfig, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, sort_keys=True)
    os.replace(tmp, path)
