"""Frozen configuration tree.

Replaces the reference's argparse-FLAGS-mutated-as-global-blackboard pattern
(/root/reference/train.py:1529-1660) with an immutable dataclass tree that is
JSON-loadable; JSON keys override defaults verbatim like the reference's
config merge (/root/reference/train.py:1657-1660).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field as dfield
from typing import Any, Mapping, Optional, Sequence, Tuple


def _tup(x):
    return tuple(x) if isinstance(x, (list, tuple)) else x


@dataclass(frozen=True)
class FieldConfig:
    """SDF / nonrigid-deform MLP architecture (ref train.py:1622-1626)."""

    n_freq: int = 6              # positional-encoding frequencies
    n_freq_deform: int = 8       # ref hmsdf.py:282 (MLP_deform n_freq=8)
    d_hidden: int = 256
    n_hidden: int = 6
    skip_in: Tuple[int, ...] = (3,)
    pose_code_dim: int = 136     # ref hmsdf.py:201 fix_code last dim
    cond_dim: int = 64           # ref hmsdf.py:331-339
    use_bfloat16: bool = False   # ref FLAGS.use_float16 analogue (hidden layers)


@dataclass(frozen=True)
class GeometryConfig:
    """Tet grid + G-Shell capacities."""

    grid_res: int = 128          # ref FLAGS.gshell_grid (f3c.json: 128)
    mesh_scale: float = 1.0      # ref FLAGS.mesh_scale
    grid_scale: float = 1.2      # ref hmsdf.py:211 (verts *= 1.2)
    grid_y_offset: float = -0.1919  # ref hmsdf.py:210
    boxscale: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    aabb: Tuple[float, ...] = (-1, -1, -1, 1, 1, 1)
    # Crop the lattice to the canonical template's bbox + this margin
    # (world units; 0 = reference-parity full box). The kept vertices are a
    # bitwise subset of the full lattice at identical cell size, so a
    # surface inside the crop extracts identically (ops/tet_grid.py) while
    # the full-grid SDF query / occupancy / compaction costs shrink with
    # the ~3-5x smaller lattice. Default OFF (0.0 = reference parity):
    # crop is only extraction-identical for surfaces inside template
    # bbox + margin, so loose garments past the margin would be silently
    # unextractable — the full-scale configs enable it explicitly
    # (configs/f3c_synth_full4.json), backed by the 128^3/1080^2 split_smpl
    # evidence in PARITY_FULL4_stage1.json (IoU 0.9367 / PSNR 26.68 at 200
    # iters vs 0.933 / 26.4 full-lattice at 1000 iters — cross-budget, see
    # the note in that file).
    grid_crop: float = 0.0
    # Static capacities for the fixed-shape marching-tets pipeline.
    # max_verts bounds SDF-crossing grid edges; max_tets bounds sign-mixed
    # tets. A human surface at grid 128 yields ~100-300k crossing edges.
    max_verts: int = 2 ** 18
    max_tets: int = 196608     # 4*max_tets faces must stay < 2^20 (raster pack)
    # Eikonal sample count (ref hmsdf.py:714 kaolin sample_points 50000)
    n_eikonal_samples: int = 50000
    # SDF MLP evaluation chunk with rematerialization: bounds backward-pass
    # activation memory over the ~2.1M grid verts (the reference chunks to
    # 100k for the same reason, ref hmsdf.py:187,436-444). 0 = no chunking.
    sdf_chunk: int = 131072

    @property
    def max_displacement(self) -> float:
        # ref hmsdf.py:388
        return 1.0 / self.grid_res * self.mesh_scale / 2.1


@dataclass(frozen=True)
class TextureConfig:
    """Hash-grid neural texture (ref render/mlptexture.py:51-116)."""

    channels: int = 6
    n_levels: int = 5
    n_features_per_level: int = 2
    log2_hashmap_size: int = 21
    base_resolution: int = 16
    desired_resolution: int = 4096
    ref_levels_for_scale: int = 16   # per_level_scale computed as if 16 levels
    internal_dims: int = 32
    hidden: int = 2
    gradient_scaling: float = 128.0  # ref mlptexture.py:78
    # Hardcoded sample bbox (ref mlptexture.py:94, preserved quirk)
    bbox_lo: Tuple[float, float, float] = (0.6, 0.6, 0.2)
    bbox_hi: Tuple[float, float, float] = (-0.8, -1.2, -0.2)


@dataclass(frozen=True)
class RenderConfig:
    train_res: Tuple[int, int] = (1080, 1080)   # f3c.json
    texture_res: Tuple[int, int] = (1080, 1080)
    spp: int = 1
    # depth-peeled layers (ref render/render.py:400-403 dr.DepthPeeler;
    # the reference default — and its own assert — is 1). layers>1 peels
    # in ops/rasterizer.py and re-composites shaded back-to-front in
    # render_mesh_full; training always consumes the nearest layer.
    layers: int = 1
    probe_res: int = 256
    env_scale: float = 2.0
    learn_lighting: bool = True
    background: str = "white"
    n_samples: int = 24
    # material clamp ranges (ref train.py:1587-1592)
    kd_min: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    kd_max: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    ks_min: Tuple[float, ...] = (0.0, 0.001, 0.0)
    ks_max: Tuple[float, ...] = (0.0, 1.0, 1.0)
    # rasterizer
    tile_h: int = 8
    tile_w: int = 128
    max_faces_per_tile: int = 512
    bin_expand: int = 16          # max tiles a face may be binned into
    backend: str = "auto"        # 'auto' | 'xla' | 'pallas'
    # texture lookups run only on covered pixels, compacted to this static
    # fraction of the frame (hash-grid gathers dominate the render cost)
    max_covered_frac: float = 0.5
    # material/normal smoothness jitter taps run on every Nth covered pixel
    # (regularizer-only inputs; expectation-rescaled in render/regularizer.py)
    jitter_subsample: int = 2
    # A/B instrumentation for the lr-0.03 stability question (STABILITY.md):
    # antialias EVERY neighbor pair on the compact path (dense _aa_weights
    # math, includes interior id-differing pairs the sparse candidate
    # filter drops) instead of the compacted silhouette pair list. Costlier;
    # OFF in production — exists to falsify/confirm "sparse-AA gradient
    # structure" as the full-scale collapse mechanism.
    aa_dense: bool = False
    # the init stage's total has NO image term (ref train.py:718 —
    # reg+normal+msk only), so texture/hash-grid shading there feeds a
    # log-only metric. False skips shading in init training steps (img_loss
    # reported as its msdf-hinge component; validation still shades) —
    # every gradient-bearing loss is bit-identical (locked by
    # tests/test_golden_losses.py::test_init_shading_off_only_zeroes_img_loss),
    # so the default is OFF: the reference pays the full texture/shade cost
    # in init only to print the value. True restores reference-parity logs.
    init_shading: bool = False

    def __post_init__(self):
        if not (1 <= self.layers <= 4):
            raise ValueError(
                f"layers={self.layers}: depth peeling supports 1-4 layers "
                f"(ref render/render.py:400-403 dr.DepthPeeler; the "
                f"reference's own loop asserts num_layers == 1). Training "
                f"consumes layer 0; extra layers feed the back-to-front "
                f"composite in render_mesh_full.")


@dataclass(frozen=True)
class LossConfig:
    loss: str = "logl1"          # ref FLAGS.loss
    sdf_regularizer: float = 0.2
    msdf_reg_open_scale: float = 1e-6
    msdf_reg_close_scale: float = 3e-6
    eikonal_scale: Optional[float] = None   # None => hardcoded schedule
    lambda_kd: float = 0.1
    lambda_ks: float = 0.05
    lambda_nrm: float = 0.025
    lambda_chroma: float = 0.0
    lambda_diffuse: float = 0.15
    lambda_specular: float = 0.0025
    use_depth: bool = False
    use_eikonal: bool = True
    use_mesh_msdf_reg: bool = True
    collision_push_eps: float = 0.005  # ref hmsdf.py:98
    perceptual_crop: int = 448          # ref hmsdf.py:1072
    # 'mobilenet' = the reference's MobileNetV2 taps [2,4,7]
    # (models/mobilenet.py; pretrained when perceptual_npz exists, else
    # deterministic He-init — A/B: scripts/ab_perceptual.py).
    # 'conv' = the lighter 3-tap random-projection pyramid.
    # Default decision (AB_PERCEPTUAL_SPLIT.json, f3c split scale, 400
    # iters): conv vs none are identical on every quality metric (chamfer
    # within 0.5%, IoU 0.903/0.905, PSNR 26.2 both) and conv costs ~2%
    # wall-clock after the im2col rewrite — 'conv' stays as the
    # reference-shaped default (the ref always applies its perceptual
    # term, hmsdf.py:901); 'none' is a supported, quality-neutral ablation.
    perceptual_backbone: str = "conv"
    perceptual_npz: str = "d3human_tpu/data/mobilenet_v2_features.npz"


@dataclass(frozen=True)
class OptimConfig:
    learning_rate: Tuple[float, float] = (0.03, 0.005)  # (pos, mat); f3c.json
    warmup_iter: int = 300
    # per-geometry-group global-norm gradient clip (stabilization deviation
    # — full-scale silhouette gradients can empty the SDF; see train/optim.py).
    # 0 = off (reference-parity dynamics); full-scale configs enable it
    # explicitly (configs/f3c*.json) where the collapse was observed.
    clip_max_norm: float = 0.0
    # init-stage sdf_net LR multiplier (ref train.py:612 hardcodes 1e-2).
    # Exposed as a stabilization knob: at full scale the sdf MLP group is the
    # one that can empty the field's zero crossing (see STABILITY.md).
    sdf_lr_mult: float = 1e-2
    # init-stage geometry/pose LR scale (STABILITY.md experiment 3): at f3c
    # scale the reference's lr_pos=0.03 rings the silhouette fit until the
    # SDF loses its zero crossing; x0.1 is the measured stable setting. The
    # deviation is scoped to init — split/seq converge at reference LRs.
    init_lr_scale: float = 1.0
    light_grad_scale: float = 64.0   # ref train.py:744-745
    hashgrid_grad_scale: float = 0.125  # ref train.py:747-750 (grad /= 8)
    nonrigid_begin: int = 20000      # ref train.py:1632


@dataclass(frozen=True)
class StageConfig:
    init_epoch: int = 2001
    split_epoch: int = 1001
    split_smpl_epoch: int = 1001
    fine_epoch: int = 1001
    seq_epoch: int = 50001
    seq_max_frames: int = 20         # ref train.py:1922
    seq_iters_first: int = 1000      # ref train.py:1349-1352
    seq_iters_rest: int = 300
    sdf_mlp_pretrain_steps: int = 3000
    sdf_deform_pretrain_steps: int = 1000
    save_checkpoint_interval: int = 500
    save_interval: int = 100
    log_interval: int = 10
    # Anchor seq-stage LBS skinning weights at the rest template (computed
    # once) instead of re-interpolating them at the nonrigidly-deformed
    # positions every iteration (reference semantics, ref
    # smplx_exavatar_deformer.py:454). Removes the per-iter [Vt x Vsmpl]
    # KNN + its backward from the seq hot loop; a perf lever, OFF by
    # default for exact reference parity.
    seq_static_skin_weights: bool = False
    # Cache the synthetic GT buffers on device (fp16, ~19 MB/frame at 1080²)
    # instead of re-rendering them with the oracle rasterizer every
    # iteration (~0.1 s/iter; the seq stage re-renders the SAME frame
    # 300-1000 consecutive iterations). OFF by default: fp16 GT moves
    # golden losses and costs HBM (1.2 GiB at 64 frames); perf lever, A/B'd
    # on hardware before any flip (data/synthetic.py:CachedTargets).
    synthetic_target_cache: bool = False


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. The seq stage shards independent per-frame
    optimizations over the ``frames`` axis; init/split stages replicate
    params and psum grads over the ``data`` axis."""

    data_axis: str = "data"
    frames_axis: str = "frames"
    n_frame_shards: int = 0          # 0 => all local devices


@dataclass(frozen=True)
class Config:
    field: FieldConfig = dfield(default_factory=FieldConfig)
    geometry: GeometryConfig = dfield(default_factory=GeometryConfig)
    texture: TextureConfig = dfield(default_factory=TextureConfig)
    render: RenderConfig = dfield(default_factory=RenderConfig)
    loss: LossConfig = dfield(default_factory=LossConfig)
    optim: OptimConfig = dfield(default_factory=OptimConfig)
    stages: StageConfig = dfield(default_factory=StageConfig)
    parallel: ParallelConfig = dfield(default_factory=ParallelConfig)
    out_dir: str = "out"
    data_dir: str = "data"
    gender: str = "neutral"
    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Map of flat reference-style JSON keys -> (section, field) so shipped-style
# configs (e.g. /root/reference/configs/f3c.json) load unchanged.
_FLAT_KEYS = {
    "gshell_grid": ("geometry", "grid_res"),
    "mesh_scale": ("geometry", "mesh_scale"),
    "boxscale": ("geometry", "boxscale"),
    "aabb": ("geometry", "aabb"),
    "train_res": ("render", "train_res"),
    "texture_res": ("render", "texture_res"),
    "spp": ("render", "spp"),
    "probe_res": ("render", "probe_res"),
    "env_scale": ("render", "env_scale"),
    "background": ("render", "background"),
    "n_samples": ("render", "n_samples"),
    "ks_min": ("render", "ks_min"),
    "ks_max": ("render", "ks_max"),
    "learning_rate": ("optim", "learning_rate"),
    "loss": ("loss", "loss"),
    "sdf_regularizer": ("loss", "sdf_regularizer"),
    "msdf_reg_open_scale": ("loss", "msdf_reg_open_scale"),
    "msdf_reg_close_scale": ("loss", "msdf_reg_close_scale"),
    "eikonal_scale": ("loss", "eikonal_scale"),
    "iter": ("stages", "init_epoch"),
    "save_interval": ("stages", "save_interval"),
    "n_hidden": ("field", "n_hidden"),
    "d_hidden": ("field", "d_hidden"),
    "n_freq": ("field", "n_freq"),
    "skip_in": ("field", "skip_in"),
    "out_dir": (None, "out_dir"),
    "gender": (None, "gender"),
}


def _apply_overrides(cfg: Config, data: Mapping[str, Any]) -> Config:
    sections = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    top: dict = {}
    for key, value in data.items():
        # 'loss' is both a flat reference FLAGS key (the image-loss name) and
        # a section name — a dict value always means the section
        if key in _FLAT_KEYS and not (key in sections
                                      and isinstance(value, Mapping)):
            sec, name = _FLAT_KEYS[key]
            value = _tup(value)
            if sec is None:
                top[name] = value
            else:
                sections[sec] = dataclasses.replace(sections[sec], **{name: value})
        elif key in sections and isinstance(value, Mapping):
            sub = {
                k: _tup(v)
                for k, v in value.items()
                if k in {f.name for f in dataclasses.fields(sections[key])}
            }
            sections[key] = dataclasses.replace(sections[key], **sub)
        elif key in {f.name for f in dataclasses.fields(cfg)}:
            top[key] = _tup(value)
        # Unknown keys are ignored (reference carried many unused flags).
    return dataclasses.replace(cfg, **{**sections, **top})


def load_config(path: Optional[str] = None, overrides: Optional[Mapping[str, Any]] = None) -> Config:
    cfg = Config()
    if path is not None:
        with open(path) as f:
            cfg = _apply_overrides(cfg, json.load(f))
    if overrides:
        cfg = _apply_overrides(cfg, overrides)
    return cfg
