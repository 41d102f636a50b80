"""The fused frame->geopose device program.

Where the reference splits the hot path over four ROS processes with DDS hops
(TwistNode SIFT -> StereoNode warp -> PoseNode LightGlue+PnP, see SURVEY.md
section 3.1 and ``core/pose_node.py:186-497`` in hmakelin/gisnav), here the
entire chain

    raster rotate+crop -> SuperPoint x2 -> LightGlue -> DEM z-lift ->
    RANSAC-PnP -> WGS84/ECEF geopose

is ONE jit-compiled XLA program over HBM-resident tensors. Host code only
uploads the camera frame (the orthoimage stack is device-resident between map
refreshes) and downloads a ~100-byte GeoPose.

Unit fix vs the reference: the reference feeds DEM meters directly as the z
of pixel-unit object points (``core/_shared.py:95-102``), which only works
because its imagery happens to be ~1 m/px. Here DEM meters are converted into
the raster's z-down pixel-unit frame via the CRS affine z-scale
(``z_px = dem_m / aff[2,2]``, the scale is negative), so the geometry is
consistent at any ground-sample distance.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gisnav_tpu.features.superpoint import SuperPoint
from gisnav_tpu.geometry.jaxops import (
    enu_to_ecef_matrix_jax,
    matrix_to_quat_jax,
    meters_per_degree_jax,
    wgs84_to_ecef_jax,
)
from gisnav_tpu.matching.lightglue import LightGlue, apply_lightglue
from gisnav_tpu.pnp.dem import gather_elevation
from gisnav_tpu.pnp.ransac import ransac_pnp
from gisnav_tpu.raster import rotate_and_crop_auto

__all__ = [
    "PipelineConfig",
    "GeoPose",
    "init_pipeline_params",
    "build_frame_to_geopose",
    "build_frame_to_geopose_cached",
    "build_frame_to_geopose_semidense",
    "build_reference_extractor",
    "init_semidense_params",
    "assemble_geopose",
]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration of the fused program (shapes compile in)."""

    image_shape: Tuple[int, int] = (480, 640)  # query frame (h, w)
    ortho_shape: Tuple[int, int] = (1024, 1024)  # orthoimage raster (h, w)
    max_keypoints: int = 1024  # per image (reference cap: pose_node.py:70)
    lightglue_depth: int = 9  # reference GPU config (pose_node.py:107-122)
    filter_threshold: float = 0.1  # LightGlue match confidence
    min_matches: int = 15  # reference MIN_MATCHES (pose_node.py:66)
    num_hypotheses: int = 64  # RANSAC batch (reference: 10 sequential iters)
    threshold_px: float = 8.0  # RANSAC inlier threshold
    refine_iters: int = 10
    score_threshold: float = 0.0005  # SuperPoint detector threshold
    detector_downsample: int = 1  # 2 = run SuperPoint at half resolution
    detector_mode: str = "learned"  # "learned" | "harris" (see SuperPoint)
    ref_keypoint_factor: int = 2  # reference budget = max_keypoints * this
    ref_tile_grid: Tuple[int, int] = (8, 8)  # uniform reference selection
    # (the official SuperPoint/LightGlue tooling resizes inputs to <=1024 px;
    # at flight altitudes the accuracy cost is small and the conv trunk cost
    # drops ~4x — the headline bench uses full resolution)


class GeoPose(NamedTuple):
    """Output of the fused program (all device scalars/small arrays)."""

    ecef_position: jnp.ndarray  # (3,) meters
    ecef_quat: jnp.ndarray  # (4,) xyzw camera_optical->ECEF
    lon_lat_alt: jnp.ndarray  # (3,) degrees, degrees, meters
    r_raster: jnp.ndarray  # (3, 3) object(raster px)->camera rotation
    cam_pos_raster: jnp.ndarray  # (3,) camera center in cropped-raster px
    m_crop: jnp.ndarray  # (3, 3) cropped->original raster pixel affine
    num_matches: jnp.ndarray  # () int32
    num_inliers: jnp.ndarray  # () int32
    valid: jnp.ndarray  # () bool
    matched_qry: jnp.ndarray  # (K, 2) matched query px (padded)
    matched_ref: jnp.ndarray  # (K, 2) matched reference px (padded)
    match_mask: jnp.ndarray  # (K,) bool


def init_pipeline_params(key: jax.Array, config: PipelineConfig) -> dict:
    """Initialize (or hold converted) SuperPoint + LightGlue parameters."""
    h, w = config.image_shape
    sp = SuperPoint(max_keypoints=config.max_keypoints,
                    score_threshold=config.score_threshold,
                    detector_mode=config.detector_mode)
    k1, k2 = jax.random.split(key)
    img = jnp.zeros((h, w), jnp.float32)
    sp_params = sp.init(k1, img)
    feats = jax.eval_shape(lambda p, im: sp.apply(p, im), sp_params, img)
    lg = LightGlue(depth=config.lightglue_depth,
                   filter_threshold=config.filter_threshold)
    dummy_kp = jnp.zeros(feats.keypoints.shape, jnp.float32)
    dummy_desc = jnp.zeros(feats.descriptors.shape, jnp.float32)
    dummy_mask = jnp.ones(feats.mask.shape, bool)
    lg_params = lg.init(
        k2, dummy_kp, dummy_desc, dummy_mask, (h, w),
        dummy_kp, dummy_desc, dummy_mask, (h, w),
    )
    return {"superpoint": sp_params, "lightglue": lg_params}


def build_frame_to_geopose(
    config: PipelineConfig,
) -> Callable[..., GeoPose]:
    """Build the (un-jitted) pure frame->geopose function.

    Signature of the returned function::

        fn(params, query, ortho, dem, rotation_deg, k, crs_affine, key)
          -> GeoPose

    - ``query``: (h, w) float32 grayscale in [0, 1]
    - ``ortho``: (H, W) float32 orthoimage grayscale in [0, 1]
    - ``dem``: (H, W) float32 elevation meters
    - ``rotation_deg``: scalar camera-yaw rotation for the reference crop
    - ``k``: (3, 3) camera intrinsics
    - ``crs_affine``: (4, 4) pixel->WGS84 affine of the FULL orthoimage
    - ``key``: PRNG key for RANSAC sampling

    Wrap with ``jax.jit`` (donate/device-put as appropriate) or ``vmap`` over
    a stream axis for multi-camera batching.
    """
    h, w = config.image_shape
    sp = SuperPoint(max_keypoints=config.max_keypoints,
                    score_threshold=config.score_threshold,
                    detector_mode=config.detector_mode)
    lg = LightGlue(depth=config.lightglue_depth,
                   filter_threshold=config.filter_threshold)

    def fn(params, query, ortho, dem, rotation_deg, k, crs_affine, key,
           gsd_zoom=None) -> GeoPose:
        # 1. reference raster: fused rotate + center crop (one gather).
        # ``gsd_zoom`` (query_gsd / map_gsd, traced) additionally resamples
        # the crop to the query camera's ground sample distance, removing
        # the 1.5-2.5x scale gap the FOV-padded map sizing leaves at low
        # altitude (the reference's stereo crop covers the FOV similarly)
        stack = jnp.stack([ortho, dem], axis=-1)
        warped, m_crop = rotate_and_crop_auto(stack, rotation_deg, (h, w),
                                              zoom=gsd_zoom)
        ref_img = warped[:, :, 0]
        dem_crop = warped[:, :, 1]

        # 2. keypoints + descriptors, both images in one batched forward
        pair = jnp.stack([query, ref_img], axis=0)
        feats = sp.apply(params["superpoint"], pair)
        f_qry = jax.tree.map(lambda a: a[0], feats)
        f_ref = jax.tree.map(lambda a: a[1], feats)

        # 3. attention matching
        match = apply_lightglue(
            lg,
            params["lightglue"],
            f_qry.keypoints, f_qry.descriptors, f_qry.mask, (h, w),
            f_ref.keypoints, f_ref.descriptors, f_ref.mask, (h, w),
        )
        midx = match.matches0
        mvalid = midx >= 0
        ref_idx = jnp.clip(midx, 0)
        mkp_qry = f_qry.keypoints
        mkp_ref = f_ref.keypoints[ref_idx]
        num_matches = jnp.sum(mvalid).astype(jnp.int32)

        # 4. DEM z-lift into the z-down pixel-unit raster frame (CROP px:
        # a GSD-matched crop resamples, 1 crop px = |det m_crop|^0.5
        # original px — keep x/y/z units consistent for PnP)
        crop_scale = jnp.sqrt(jnp.abs(jnp.linalg.det(m_crop[:2, :2])))
        z_scale = crs_affine[2, 2] * crop_scale  # negative m-per-crop-px
        dem_m = gather_elevation(dem_crop, mkp_ref)
        z_obj = dem_m / z_scale
        obj = jnp.concatenate([mkp_ref, z_obj[:, None]], axis=1)

        # 5. robust pose
        pnp = ransac_pnp(
            obj, mkp_qry, k, mvalid,
            key=key,
            num_hypotheses=config.num_hypotheses,
            threshold_px=config.threshold_px,
            min_inliers=config.min_matches,
            refine_iters=config.refine_iters,
        )

        # 6. geopose assembly (reference semantics: pose_node.py:332-381)
        ecef, quat, lla, cam_pos = assemble_geopose(
            pnp.r, pnp.t, m_crop, crs_affine
        )
        valid = pnp.valid & (num_matches >= config.min_matches)

        return GeoPose(
            ecef_position=ecef,
            ecef_quat=quat,
            lon_lat_alt=lla,
            r_raster=pnp.r,
            cam_pos_raster=cam_pos,
            m_crop=m_crop,
            num_matches=num_matches,
            num_inliers=pnp.num_inliers,
            valid=valid,
            matched_qry=mkp_qry,
            matched_ref=mkp_ref,
            match_mask=mvalid & pnp.inliers,
        )

    return fn


def assemble_geopose(r, t, m_crop, crs_affine):
    """Turn a PnP pose in the cropped-raster frame into a WGS84/ECEF geopose.

    Reference semantics: ``pose_node.py:332-381`` — camera center through the
    (warp-composed) CRS affine, orientation via raster->ENU->ECEF chain.

    :param r: (3, 3) object(cropped raster px)->camera rotation
    :param t: (3,) PnP translation
    :param m_crop: (3, 3) cropped->original raster pixel affine
    :param crs_affine: (4, 4) original-raster pixel->WGS84 affine
    :return: (ecef_position (3,), ecef_quat xyzw (4,), lon_lat_alt (3,),
        cam_pos_raster (3,))
    """
    # Absolute-coordinate math MUST NOT go through the MXU's default bf16
    # matmul precision: the affine's translation column holds absolute
    # lon/lat (e.g. 24.013 deg), and bf16's ~8-bit mantissa truncates that
    # to 24.0 — a multi-km geolocation error that only appears ON TPU (CPU
    # matmuls are f32, which is why the CPU e2e suite never saw it).
    with jax.default_matmul_precision("float32"):
        cam_pos = -r.T @ t  # camera center in cropped-raster frame

        # CRS affine for the CROPPED frame: crs @ embed(cropped->original).
        # The z row scales by the crop's isotropic pixel scale (GSD-matched
        # crops resample: 1 crop px = zoom original px; the PnP camera z is in
        # CROP pixel units and crs_affine's z codec is per ORIGINAL px)
        crop_scale = jnp.sqrt(jnp.abs(jnp.linalg.det(m_crop[:2, :2])))
        embed = jnp.eye(4).at[:2, :2].set(m_crop[:2, :2]).at[:2, 3].set(
            m_crop[:2, 2]
        ).at[2, 2].set(crop_scale)
        aff = crs_affine @ embed
        lla = aff @ jnp.concatenate([cam_pos, jnp.ones(1)])
        lon, lat, alt = lla[0], lla[1], lla[2]
        ecef = wgs84_to_ecef_jax(lon, lat, alt)

    # orientation: raster(ESD px) -> ENU. The reference normalizes the
    # affine's columns directly (pose_node.py:371-373), which skews heading
    # by the degree anisotropy (a lon-degree is cos(lat) shorter than a
    # lat-degree); we rescale rows to meters first so the linear part
    # becomes a true similarity before normalization.
    with jax.default_matmul_precision("float32"):
        m_lon, m_lat = meters_per_degree_jax(lat)
        metric = jnp.diag(jnp.stack([m_lon, m_lat, jnp.ones(())]))
        r_cols = metric @ aff[:3, :3]
        r_enu = r_cols / jnp.maximum(
            jnp.linalg.norm(r_cols, axis=0, keepdims=True), 1e-12
        )
        cam_rot_enu = r_enu @ r.T
        r_ecef = enu_to_ecef_matrix_jax(lon, lat) @ cam_rot_enu
        quat = matrix_to_quat_jax(r_ecef)
    return ecef, quat, jnp.stack([lon, lat, alt]), cam_pos


def geopose_to_wgs84_f64(geopose: GeoPose, crs_affine_f64):
    """Host-side float64 re-assembly of the geopose for precision consumers.

    The device program runs float32, which quantizes absolute lon/lat at
    ~0.2 m and ECEF at ~0.5 m. The raster-frame outputs (``cam_pos_raster``,
    ``r_raster``, ``m_crop``) are float32-exact at sub-millimeter pixel scale,
    so the mock-GPS path recomputes the final absolute coordinates here in
    float64 from those plus the full-precision CRS affine.

    :param crs_affine_f64: (4, 4) float64 pixel->WGS84 affine of the full
        orthoimage (host copy, never truncated to f32)
    :return: dict with lon, lat, alt_ellipsoid, ecef (3,), quat_ecef xyzw (4,)
    """
    import numpy as np

    from gisnav_tpu.geometry.crs import enu_to_ecef_matrix, wgs84_to_ecef
    from gisnav_tpu.geometry.quaternion import matrix_to_quat

    cam_pos = np.asarray(geopose.cam_pos_raster, dtype=np.float64)
    r = np.asarray(geopose.r_raster, dtype=np.float64)
    m_crop = np.asarray(geopose.m_crop, dtype=np.float64)
    aff = np.asarray(crs_affine_f64, dtype=np.float64)

    embed = np.eye(4)
    embed[:2, :2] = m_crop[:2, :2]
    embed[:2, 3] = m_crop[:2, 2]
    # crop px -> original px z scale (GSD-matched crops resample; see
    # assemble_geopose)
    embed[2, 2] = np.sqrt(abs(np.linalg.det(m_crop[:2, :2])))
    aff = aff @ embed

    lla = aff @ np.append(cam_pos, 1.0)
    lon, lat, alt = float(lla[0]), float(lla[1]), float(lla[2])
    x, y, z = wgs84_to_ecef(lon, lat, alt)

    # metric-rescaled raster->ENU (see assemble_geopose)
    lat_r = np.radians(lat)
    from gisnav_tpu.geometry.crs import WGS84_A, WGS84_E2

    w2 = 1.0 - WGS84_E2 * np.sin(lat_r) ** 2
    m_lon = WGS84_A / np.sqrt(w2) * np.cos(lat_r) * np.pi / 180.0
    m_lat = WGS84_A * (1.0 - WGS84_E2) / w2**1.5 * np.pi / 180.0
    metric = np.diag([m_lon, m_lat, 1.0])
    r_cols = metric @ aff[:3, :3]
    r_enu = r_cols / np.linalg.norm(r_cols, axis=0, keepdims=True)
    r_ecef = enu_to_ecef_matrix(lon, lat) @ (r_enu @ r.T)
    # project to SO(3) (column normalization leaves slight non-orthogonality);
    # an invalid pose carries NaNs and must not crash the host-side SVD —
    # callers gate on pose.valid, this output is then meaningless but finite
    if np.all(np.isfinite(r_ecef)):
        u, _, vt = np.linalg.svd(r_ecef)
        r_ecef = u @ np.diag([1.0, 1.0, np.linalg.det(u @ vt)]) @ vt
    else:
        r_ecef = np.eye(3)

    return {
        "lon": lon,
        "lat": lat,
        "alt_ellipsoid": alt,
        "ecef": np.array([x, y, z]),
        "quat_ecef": matrix_to_quat(r_ecef),
        "r_enu_cam": r_enu @ r.T,
    }


def init_semidense_params(key: jax.Array, config: PipelineConfig) -> dict:
    """Initialize LoFTR parameters for the semi-dense pipeline variant."""
    from gisnav_tpu.matching.loftr import LoFTR

    h, w = config.image_shape
    loftr = LoFTR(max_matches=config.max_keypoints)
    img = jnp.zeros((h, w), jnp.float32)
    return {"loftr": loftr.init(key, img, img)}


def build_frame_to_geopose_semidense(config: PipelineConfig):
    """Detector-free warp-mode variant: LoFTR replaces SuperPoint+LightGlue.

    Same call signature as :func:`build_frame_to_geopose`. Semi-dense
    coarse-to-fine matching trades keypoint repeatability for dense coarse
    coverage — the stronger choice on low-texture terrain (fields, water
    margins) where detector-based matching starves. Capability parity with
    the reference's alternative matcher configurations
    (``core/pose_node.py:88-122`` in hmakelin/gisnav selects the matcher
    model); this variant is selected by ``PoseNode(backend="semidense")``.
    """
    from gisnav_tpu.matching.loftr import LoFTR

    h, w = config.image_shape
    loftr = LoFTR(max_matches=config.max_keypoints)

    def fn(params, query, ortho, dem, rotation_deg, k, crs_affine, key,
           gsd_zoom=None) -> GeoPose:
        # GSD-matched crop is ESSENTIAL here: LoFTR's dual-softmax matches
        # coarse cells 1:1 in scale — at the production map sizing the raw
        # crop is ~2.4x coarser than the query and coarse matching starves
        # entirely (round-4: 0 valid poses on the envelope flight without
        # zoom; the detector path tolerates the gap via descriptor scale
        # robustness, cell matching cannot)
        stack = jnp.stack([ortho, dem], axis=-1)
        warped, m_crop = rotate_and_crop_auto(stack, rotation_deg, (h, w),
                                              zoom=gsd_zoom)
        ref_img = warped[:, :, 0]
        dem_crop = warped[:, :, 1]

        match = loftr.apply(params["loftr"], query, ref_img)
        mkp_qry = match.kp0
        mkp_ref = match.kp1
        mvalid = match.mask
        num_matches = jnp.sum(mvalid).astype(jnp.int32)

        # z units must match the x/y CROP-pixel units: the GSD zoom makes
        # 1 crop px = |det m_crop[:2,:2]|^0.5 original px (same reasoning
        # as build_frame_to_geopose step 4 above)
        crop_scale = jnp.sqrt(jnp.abs(jnp.linalg.det(m_crop[:2, :2])))
        z_scale = crs_affine[2, 2] * crop_scale
        dem_m = gather_elevation(dem_crop, mkp_ref)
        obj = jnp.concatenate([mkp_ref, (dem_m / z_scale)[:, None]], axis=1)

        pnp = ransac_pnp(
            obj, mkp_qry, k, mvalid,
            key=key,
            num_hypotheses=config.num_hypotheses,
            threshold_px=config.threshold_px,
            min_inliers=config.min_matches,
            refine_iters=config.refine_iters,
        )

        ecef, quat, lla, cam_pos = assemble_geopose(
            pnp.r, pnp.t, m_crop, crs_affine
        )
        valid = pnp.valid & (num_matches >= config.min_matches)

        return GeoPose(
            ecef_position=ecef,
            ecef_quat=quat,
            lon_lat_alt=lla,
            r_raster=pnp.r,
            cam_pos_raster=cam_pos,
            m_crop=m_crop,
            num_matches=num_matches,
            num_inliers=pnp.num_inliers,
            valid=valid,
            matched_qry=mkp_qry,
            matched_ref=mkp_ref,
            match_mask=mvalid & pnp.inliers,
        )

    return fn


def build_reference_extractor(config: PipelineConfig):
    """Build the per-map-refresh reference feature extractor.

    Cached-reference mode: SuperPoint runs over the FULL orthoimage once per
    map refresh (the reference refreshes maps only below 0.85 bbox overlap,
    ``core/gis_node.py:124-128`` — every tens of frames in flight), and the
    per-frame program consumes the cached HBM-resident feature set. This
    removes both the raster warp and the second SuperPoint forward from the
    hot path — the TPU-first replacement for the reference's 45-degree
    rotation-bucket warp cache (``stereo_node.py:222-267``): LightGlue's
    rotary position encoding handles rotation instead of aligning rasters.

    Reference keypoints use more budget than query keypoints (the raster is
    larger): ``max_keypoints * ref_keypoint_factor``.
    """
    sp = SuperPoint(
        max_keypoints=config.max_keypoints * config.ref_keypoint_factor,
        score_threshold=config.score_threshold,
        detector_mode=config.detector_mode,
        # uniform spatial budget: a camera FOV covers only ~5-20% of the
        # FOV-padded map raster; a global top-K concentrates on globally
        # strongest corners and can leave the FOV nearly empty (measured:
        # 49/1024 in-FOV at 500 m AGL -> cached matching starves)
        select_tiles=config.ref_tile_grid,
    )

    def extract(params, ortho: jnp.ndarray):
        return sp.apply(params["superpoint"], ortho)

    return extract


def build_frame_to_geopose_cached(config: PipelineConfig):
    """Hot-path variant matching against precomputed full-raster features.

    Signature::

        fn(params, query, ref_feats, dem, k, crs_affine, key,
           rotation_deg=None) -> GeoPose

    ``ref_feats`` is the output of :func:`build_reference_extractor` (full
    orthoimage pixel coordinates); ``dem`` is the full DEM raster. The
    returned pose is in the FULL raster frame (``m_crop`` = identity).

    ``rotation_deg`` (optional, traced): the map-alignment rotation the
    warp-mode pipeline would apply to the REFERENCE (camera heading,
    cv2-CCW sign — ``PoseNode._rotation_deg``). When given, the QUERY is
    derotated by the inverse instead: features are extracted on a
    camera-yaw-aligned query (matching becomes the easy north-up-aligned
    case the matcher trains on) while PnP runs on the keypoints mapped
    back to true camera pixels. Query-side derotation costs a (h, w) warp
    (~6x cheaper than the reference's map-sized warp,
    ``stereo_node.py:292-335``) and makes cached-mode rotation robustness
    attitude-driven rather than learned; omit it (None) to skip the warp
    entirely and rely on rotary-encoding invariance.
    """
    h, w = config.image_shape
    oh, ow = config.ortho_shape
    sp = SuperPoint(max_keypoints=config.max_keypoints,
                    score_threshold=config.score_threshold,
                    detector_mode=config.detector_mode)
    lg = LightGlue(depth=config.lightglue_depth,
                   filter_threshold=config.filter_threshold)

    ds = config.detector_downsample

    def fn(params, query, ref_feats, dem, k, crs_affine, key,
           prior_xy=None, prior_radius=-1.0, rotation_deg=None) -> GeoPose:
        # GSD matching for cached-reference mode happens through
        # ``detector_downsample``: the runner quantizes query_gsd/map_gsd
        # to an integer mean-pool factor (a reshape — effectively free,
        # unlike a full-res resampling gather which costs ~70 ms at 1080p
        # on TPU) and compiles one program per altitude band. CNN
        # descriptors bridge the <=1.4x residual scale gap; the measured
        # cliff is at ~1.6x (10/58 correct matches vs 91/128 at 0.9x).
        hq, wq = query.shape
        if ds > 1:
            src = query.reshape(hq // ds, ds, wq // ds, ds).mean((1, 3))
        else:
            src = query

        if rotation_deg is not None:
            # query-side derotation (see builder docstring). Convention:
            # callers pass the MAP-ALIGNMENT rotation (the angle warp mode
            # rotates the reference by, ``PoseNode._rotation_deg``); the
            # query needs the INVERSE to become north-up (render-alignment
            # verified: ncc=1.0 at -rotation on the synthetic world; the
            # round-3 comment claiming the same sign was measured through
            # its own bug). m_q maps derotated -> camera pixel coords.
            derot, m_q = rotate_and_crop_auto(
                src[..., None], -jnp.asarray(rotation_deg, jnp.float32),
                src.shape,
            )
            f_qry = sp.apply(params["superpoint"], derot[..., 0])
            kp_rot = f_qry.keypoints  # derotated (pooled) frame
            with jax.default_matmul_precision("float32"):
                kp_cam = kp_rot @ m_q[:2, :2].T + m_q[:2, 2]
            kp_match = kp_rot * ds   # matcher sees map-aligned geometry
            kp_pnp = kp_cam * ds     # PnP sees true camera pixels
        else:
            f_qry = sp.apply(params["superpoint"], src)
            kp_match = kp_pnp = f_qry.keypoints * ds

        # position-prior gating: cached map features span an area 5-20x the
        # FOV; restricting the candidate set to the predicted FOV
        # neighborhood removes the distractor mass that otherwise drowns
        # the matcher (the reference achieves the same implicitly by
        # warping a FOV-sized crop, stereo_node.py:292-335). prior_radius
        # <= 0 disables; traced scalars, no recompile per frame.
        ref_mask = ref_feats.mask
        if prior_xy is not None:
            d2 = jnp.sum(
                (ref_feats.keypoints
                 - jnp.asarray(prior_xy, jnp.float32)[None]) ** 2,
                axis=1,
            )
            r = jnp.asarray(prior_radius, jnp.float32)
            ref_mask = ref_mask & ((r <= 0) | (d2 <= r * r))

        match = apply_lightglue(
            lg,
            params["lightglue"],
            kp_match, f_qry.descriptors, f_qry.mask, (h, w),
            ref_feats.keypoints, ref_feats.descriptors, ref_mask,
            (oh, ow),
        )
        midx = match.matches0
        mvalid = midx >= 0
        ref_idx = jnp.clip(midx, 0)
        mkp_qry = kp_pnp
        mkp_ref = ref_feats.keypoints[ref_idx]
        num_matches = jnp.sum(mvalid).astype(jnp.int32)

        z_scale = crs_affine[2, 2]
        dem_m = gather_elevation(dem, mkp_ref)
        obj = jnp.concatenate([mkp_ref, (dem_m / z_scale)[:, None]], axis=1)

        pnp = ransac_pnp(
            obj, mkp_qry, k, mvalid,
            key=key,
            num_hypotheses=config.num_hypotheses,
            threshold_px=config.threshold_px,
            min_inliers=config.min_matches,
            refine_iters=config.refine_iters,
        )

        m_crop = jnp.eye(3)
        ecef, quat, lla, cam_pos = assemble_geopose(
            pnp.r, pnp.t, m_crop, crs_affine
        )
        valid = pnp.valid & (num_matches >= config.min_matches)

        return GeoPose(
            ecef_position=ecef,
            ecef_quat=quat,
            lon_lat_alt=lla,
            r_raster=pnp.r,
            cam_pos_raster=cam_pos,
            m_crop=m_crop,
            num_matches=num_matches,
            num_inliers=pnp.num_inliers,
            valid=valid,
            matched_qry=mkp_qry,
            matched_ref=mkp_ref,
            match_mask=mvalid & pnp.inliers,
        )

    return fn


def build_warp_reference_extractor(config: PipelineConfig):
    """Per-bucket reference extractor for BUCKETED warp mode.

    Runs the warp-mode reference side once per (map refresh, rotation
    bucket, zoom band): fused rotate + GSD crop of the ortho/DEM stack at a
    QUANTIZED rotation/zoom, then SuperPoint over the warped crop.

    Signature::

        fn(params, ortho, dem, rotation_deg, gsd_zoom) ->
            (ref_feats, dem_crop, m_crop)

    The TPU-first equivalent of the reference's 45-degree rotation-bucket
    warp cache (``stereo_node.py:222-267`` in hmakelin/gisnav), with the
    residual in-bucket rotation absorbed by the matcher instead of a
    second raster warp.
    """
    h, w = config.image_shape
    sp = SuperPoint(max_keypoints=config.max_keypoints,
                    score_threshold=config.score_threshold,
                    detector_mode=config.detector_mode)

    def fn(params, ortho, dem, rotation_deg, gsd_zoom=None):
        stack = jnp.stack([ortho, dem], axis=-1)
        warped, m_crop = rotate_and_crop_auto(stack, rotation_deg, (h, w),
                                              zoom=gsd_zoom)
        feats = sp.apply(params["superpoint"], warped[:, :, 0])
        return feats, warped[:, :, 1], m_crop

    return fn


def build_frame_to_geopose_warpcached(config: PipelineConfig):
    """Hot path for BUCKETED warp mode: query-only extraction matched
    against cached bucket-warped reference features.

    Signature::

        fn(params, query, ref_feats, dem_crop, m_crop, k, crs_affine, key)
            -> GeoPose

    Identical math to :func:`build_frame_to_geopose` steps 2-6 with the
    reference half taken from :func:`build_warp_reference_extractor`
    (``ref_feats``/``dem_crop`` are in the warped-crop frame; ``m_crop``
    carries the bucket's crop->raster affine into geopose assembly). The
    residual rotation between the query and the bucket-warped crop is at
    most half the runner's bucket width — inside the matcher's rotary
    robustness — so this posts warp-mode accuracy at cached-mode per-frame
    cost (the map trunk leaves the hot path).
    """
    h, w = config.image_shape
    sp = SuperPoint(max_keypoints=config.max_keypoints,
                    score_threshold=config.score_threshold,
                    detector_mode=config.detector_mode)
    lg = LightGlue(depth=config.lightglue_depth,
                   filter_threshold=config.filter_threshold)

    def fn(params, query, ref_feats, dem_crop, m_crop, k, crs_affine,
           key) -> GeoPose:
        f_qry = sp.apply(params["superpoint"], query)

        match = apply_lightglue(
            lg,
            params["lightglue"],
            f_qry.keypoints, f_qry.descriptors, f_qry.mask, (h, w),
            ref_feats.keypoints, ref_feats.descriptors, ref_feats.mask,
            (h, w),
        )
        midx = match.matches0
        mvalid = midx >= 0
        ref_idx = jnp.clip(midx, 0)
        mkp_qry = f_qry.keypoints
        mkp_ref = ref_feats.keypoints[ref_idx]
        num_matches = jnp.sum(mvalid).astype(jnp.int32)

        # DEM z-lift in crop-pixel units (see build_frame_to_geopose step 4)
        crop_scale = jnp.sqrt(jnp.abs(jnp.linalg.det(m_crop[:2, :2])))
        z_scale = crs_affine[2, 2] * crop_scale
        dem_m = gather_elevation(dem_crop, mkp_ref)
        obj = jnp.concatenate(
            [mkp_ref, (dem_m / z_scale)[:, None]], axis=1)

        pnp = ransac_pnp(
            obj, mkp_qry, k, mvalid,
            key=key,
            num_hypotheses=config.num_hypotheses,
            threshold_px=config.threshold_px,
            min_inliers=config.min_matches,
            refine_iters=config.refine_iters,
        )

        ecef, quat, lla, cam_pos = assemble_geopose(
            pnp.r, pnp.t, m_crop, crs_affine
        )
        valid = pnp.valid & (num_matches >= config.min_matches)

        return GeoPose(
            ecef_position=ecef,
            ecef_quat=quat,
            lon_lat_alt=lla,
            r_raster=pnp.r,
            cam_pos_raster=cam_pos,
            m_crop=m_crop,
            num_matches=num_matches,
            num_inliers=pnp.num_inliers,
            valid=valid,
            matched_qry=mkp_qry,
            matched_ref=mkp_ref,
            match_mask=mvalid & pnp.inliers,
        )

    return fn
