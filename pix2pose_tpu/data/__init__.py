"""Dataset & model I/O: PLY meshes, BOP dataset layout, target lists,
results CSV."""

from pix2pose_tpu.data.ply import load_ply, save_ply  # noqa: F401
from pix2pose_tpu.data.bop import (  # noqa: F401
    BopDataset,
    get_target_list,
    load_bop_results,
    save_bop_results,
)
