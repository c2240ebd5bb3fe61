"""TPU-first tensor ops: crop/resize, coordinate color codec, PnP-RANSAC,
rasterization, ICP, depth geometry. All ops are jittable, shape-static and
batched; none of them call host libraries on the hot path."""
