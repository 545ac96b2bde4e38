"""flow_gmflow band driver (reference `bands/flow_gmflow.py`): GMFlow at 0.75
scale, /16 padding, swin transformer + global matching, bidirectional; see
bands/flow_base.py for the shared output contract.

Note: the reference only computes bwd flow when masks/backwards are requested
(flow_gmflow.py:88); here fwd+bwd always ride the same doubled batch — the
extra cost is one transposed-softmax, and outputs are unchanged.
"""

from __future__ import annotations

from prisma_tpu.bands.base import BandIO
from prisma_tpu.bands.flow_base import run_flow_band
from prisma_tpu.models import gmflow as jgm
from prisma_tpu.runtime.config import RuntimeConfig
from prisma_tpu.weights.store import load_gmflow

BAND = "flow_gmflow"


def run(input_path: str, output: str = "", subpath: str = "",
        backwards: bool = False, mask: bool = False, scale: float = 0.75,
        runtime: RuntimeConfig | None = None) -> BandIO:
    runtime = runtime or RuntimeConfig()
    params = load_gmflow(runtime)
    return run_flow_band(BAND, input_path, params, jgm.infer_pairs,
                         output=output, subpath=subpath, backwards=backwards,
                         mask=mask, scale=scale, runtime=runtime)
