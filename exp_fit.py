"""Component-swap experiment on a failing bench frame pair: which stage
(features vs disparity) makes the rigid fit exceed the 1 m gate?
Fits cv2.estimateAffine3D on all four combinations of
{cv2 ORB, our ORB} x {cv2 disparity->3D, our disparity->3D}.
Not part of the test suite."""

import sys

import cv2
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bilinear(im3d, x, y):
    sys.path.insert(0, "/root/reference/src")
    from openVO.stereo_odometer import StereoOdometer as R
    return R.bilinear_interpolate_pixels(None, im3d, x, y)


def fit(cur, nxt):
    T, _scale = cv2.estimateAffine3D(cur, nxt, force_rotation=True)
    T = np.vstack([T, [0, 0, 0, 1]])
    return T


def main():
    import jax.numpy as jnp
    from openvo_tpu import StereoCamera, OdometerConfig
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.ops.orb import detect_and_compute

    IMG_SIZE = (1242, 376)
    F, B = 718.0, 0.54
    SGBM = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }
    seq = render_stereo_sequence(n_frames=16, img_size=IMG_SIZE, f=F,
                                 baseline=B, seed=0, step=0.5,
                                 yaw_rate=0.004)
    i0, i1 = 6, 7   # frame 7 fails with bigdist in diag_tracking
    frames = {}
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM, IMG_SIZE)

    sys.path.insert(0, "/root/reference/src")
    from openVO.stereo_camera import StereoCamera as RefCamera
    ref_cam = RefCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                        {"R": seq["R"], "T": seq["T"].reshape(3, 1)},
                        SGBM, IMG_SIZE)

    cfg = OdometerConfig()
    for i in (i0, i1):
        left = np.clip(seq["left"][i], 0, 255).astype(np.uint8)
        right = np.clip(seq["right"][i], 0, 255).astype(np.uint8)
        r3d, rdisp, rimg = ref_cam.compute_3d(left, right)
        o3d, odisp, oimg = (np.asarray(v) for v in
                            cam.compute_3d(left, right))
        # ROIs differ by a pixel of round-off; crop to the common region.
        mh = min(rdisp.shape[0], odisp.shape[0])
        mw = min(rdisp.shape[1], odisp.shape[1])
        r3d, rdisp, rimg = r3d[:mh, :mw], rdisp[:mh, :mw], rimg[:mh, :mw]
        o3d, odisp, oimg = o3d[:mh, :mw], odisp[:mh, :mw], oimg[:mh, :mw]
        both = (rdisp > 0) & (odisp > 0)
        log(f"frame {i}: disp co-valid {both.mean():.2f}, "
            f"|diff| median {np.median(np.abs(rdisp[both]-odisp[both])):.3f} "
            f"p90 {np.percentile(np.abs(rdisp[both]-odisp[both]), 90):.3f}")
        frames[i] = dict(r3d=r3d, rdisp=rdisp, rimg=rimg, o3d=o3d,
                         odisp=odisp, oimg=oimg.astype(np.uint8))

    def feature_mask(disp):
        return ((disp >= 4) & (disp <= 100)).astype(np.uint8) * 255

    # cv2 ORB features
    orb = cv2.ORB_create(nfeatures=500)
    matcher = cv2.BFMatcher.create(cv2.NORM_HAMMING)

    def cv2_feats(i):
        f = frames[i]
        kps, desc = orb.detectAndCompute(f["rimg"],
                                         feature_mask(f["rdisp"]))
        return kps, desc

    def our_feats(i):
        f = frames[i]
        out = detect_and_compute(jnp.asarray(f["oimg"], jnp.float32),
                                 jnp.asarray(feature_mask(f["odisp"])),
                                 cfg.orb)
        v = np.asarray(out["valid"])
        return np.asarray(out["xy"])[v], np.asarray(out["desc"])[v]

    def match_fit(kp0, d0, kp1, d1, im3d0, im3d1, tag):
        matches = matcher.knnMatch(d0, d1, k=2)
        good = [m for m, n in matches if m.distance < 0.8 * n.distance]
        cur, nxt = [], []
        for m in good:
            p0 = kp0[m.queryIdx].pt if hasattr(kp0[m.queryIdx], "pt") \
                else kp0[m.queryIdx]
            p1 = kp1[m.trainIdx].pt if hasattr(kp1[m.trainIdx], "pt") \
                else kp1[m.trainIdx]
            a = bilinear(im3d0, p0[0], p0[1])
            b = bilinear(im3d1, p1[0], p1[1])
            if np.all(np.isfinite(a)) and np.all(np.isfinite(b)):
                cur.append(a)
                nxt.append(b)
        cur, nxt = np.float64(cur), np.float64(nxt)
        T = fit(cur, nxt)
        t = np.linalg.norm(T[:3, 3])
        res = np.linalg.norm(nxt - (cur @ T[:3, :3].T + T[:3, 3]), axis=1)
        log(f"{tag:22s}: n={len(cur):3d} |t|={t:7.3f} "
            f"res_med={np.median(res):.3f} res_p90={np.percentile(res, 90):.3f}")

    ck0, cd0 = cv2_feats(i0)
    ck1, cd1 = cv2_feats(i1)
    ok0, od0 = our_feats(i0)
    ok1, od1 = our_feats(i1)
    log(f"features: cv2 {len(ck0)}/{len(ck1)}, ours {len(ok0)}/{len(ok1)}")
    f0, f1 = frames[i0], frames[i1]
    match_fit(ck0, cd0, ck1, cd1, f0["r3d"], f1["r3d"], "cv2orb + cv2disp")
    match_fit(ck0, cd0, ck1, cd1, f0["o3d"], f1["o3d"], "cv2orb + ourdisp")
    match_fit(ok0, od0, ok1, od1, f0["r3d"], f1["r3d"], "ourorb + cv2disp")
    match_fit(ok0, od0, ok1, od1, f0["o3d"], f1["o3d"], "ourorb + ourdisp")


if __name__ == "__main__" and "--probe" not in sys.argv and "--probe2" not in sys.argv:
    main()


def pipeline_probe():
    """Fit the PIPELINE's own matched point clouds two ways: our f32
    kabsch vs cv2's f64 estimator."""
    import jax
    import jax.numpy as jnp
    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import make_pipeline_fns
    from openvo_tpu.pose.kabsch import kabsch

    IMG_SIZE = (1242, 376)
    SGBM = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }
    seq = render_stereo_sequence(n_frames=16, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0, step=0.5,
                                 yaw_rate=0.004)
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM, IMG_SIZE)
    cfg = OdometerConfig()
    fns = make_pipeline_fns(cam, cfg, color=False)
    extract = jax.jit(fns["extract"])
    pc = jax.jit(fns["point_clouds"])

    for i0, i1 in ((6, 7), (8, 9)):
        fa = extract(jnp.asarray(np.clip(seq["left"][i0], 0, 255).astype(np.uint8)),
                     jnp.asarray(np.clip(seq["right"][i0], 0, 255).astype(np.uint8)))
        fb = extract(jnp.asarray(np.clip(seq["left"][i1], 0, 255).astype(np.uint8)),
                     jnp.asarray(np.clip(seq["right"][i1], 0, 255).astype(np.uint8)))
        pts_a, pts_b, mok, enough, n = pc(fa, fb)
        a = np.asarray(pts_a, np.float64)
        b = np.asarray(pts_b, np.float64)
        m = np.asarray(mok)
        fin = np.isfinite(a).all(1) & np.isfinite(b).all(1)
        log(f"pair {i0}->{i1}: matches={m.sum()} finite={(m & fin).sum()} "
            f"nonfinite_matched={(m & ~fin).sum()}")
        am, bm = a[m & fin], b[m & fin]
        T = fit(am, bm)
        log(f"  cv2 fit on finite:   |t|={np.linalg.norm(T[:3, 3]):.3f}")
        Tk = np.asarray(kabsch(jnp.asarray(a, jnp.float32),
                               jnp.asarray(b, jnp.float32), jnp.asarray(m)))
        log(f"  our kabsch (m):      |t|={np.linalg.norm(Tk[:3, 3]):.3f} "
            f"nan={np.isnan(Tk).any()}")
        Tk2 = np.asarray(kabsch(jnp.asarray(a, jnp.float32),
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(m & fin)))
        log(f"  our kabsch (m&fin):  |t|={np.linalg.norm(Tk2[:3, 3]):.3f}")
        if (m & ~fin).any():
            bad = np.where(m & ~fin)[0][:5]
            for j in bad:
                log(f"   nonfinite match {j}: a={a[j]} b={b[j]}")
        # distance distribution of matched points
        z = np.abs(am[:, 2])
        log(f"  matched |Z|: med={np.median(z):.1f} p90={np.percentile(z, 90):.1f} max={z.max():.1f}")


if __name__ == "__main__" and "--probe" in sys.argv:
    pipeline_probe()


def probe2():
    """Separate matcher vs sampler: fit (our matches + ref-sampled points)
    and (cv2 matches + our-sampled points); residuals vs ground truth."""
    import jax
    import jax.numpy as jnp
    from openvo_tpu import OdometerConfig, StereoCamera
    from openvo_tpu.io.synthetic import render_stereo_sequence
    from openvo_tpu.models.stereo_odometer import make_pipeline_fns
    from openvo_tpu.ops.interpolate import bilinear_sample_3d

    IMG_SIZE = (1242, 376)
    SGBM = {
        "minDisparity": 0, "numDisparities": 128, "blockSize": 5,
        "P1": 200, "P2": 800, "disp12MaxDiff": 1, "preFilterCap": 63,
        "uniquenessRatio": 10, "speckleWindowSize": 0, "speckleRange": 0,
    }
    seq = render_stereo_sequence(n_frames=16, img_size=IMG_SIZE, f=718.0,
                                 baseline=0.54, seed=0, step=0.5,
                                 yaw_rate=0.004)
    cam = StereoCamera(seq["K"], seq["dist"], seq["K"], seq["dist"],
                       {"R": seq["R"], "T": seq["T"]}, SGBM, IMG_SIZE)
    cfg = OdometerConfig()
    fns = make_pipeline_fns(cam, cfg, color=False)
    extract = jax.jit(fns["extract"])
    pc = jax.jit(fns["point_clouds"])
    matcher = cv2.BFMatcher.create(cv2.NORM_HAMMING)

    i0, i1 = 8, 9
    u8 = lambda a: np.clip(a, 0, 255).astype(np.uint8)
    fa = extract(jnp.asarray(u8(seq["left"][i0])), jnp.asarray(u8(seq["right"][i0])))
    fb = extract(jnp.asarray(u8(seq["left"][i1])), jnp.asarray(u8(seq["right"][i1])))
    pts_a, pts_b, mok, _, _ = pc(fa, fb)
    a = np.asarray(pts_a, np.float64)
    b = np.asarray(pts_b, np.float64)
    m = np.asarray(mok)
    xya = np.asarray(fa.kp_xy)
    xyb = np.asarray(fb.kp_xy)
    desc_a = np.asarray(fa.desc)
    desc_b = np.asarray(fb.desc)
    va = np.asarray(fa.kp_valid)
    vb = np.asarray(fb.kp_valid)
    xyz_a = np.asarray(fa.xyz)
    xyz_b = np.asarray(fb.xyz)
    from openvo_tpu.models.stereo_odometer import make_pipeline_fns as _
    import jax.numpy as _j
    train_idx = np.asarray(jax.jit(lambda fa, fb: __import__(
        'openvo_tpu.ops.hamming', fromlist=['ratio_test_match']
    ).ratio_test_match(fa.desc, fb.desc, 0.8, fa.kp_valid, fb.kp_valid)[0])(fa, fb))

    T_wc = np.asarray(seq["T_wc"], np.float64)
    T_true = np.linalg.inv(T_wc[i1]) @ T_wc[i0]

    res = np.linalg.norm(b - (a @ T_true[:3, :3].T + T_true[:3, 3]), axis=1)
    mm = m & np.isfinite(res)
    log(f"our matches: {m.sum()}, gt-residual med={np.median(res[mm]):.3f} "
        f"p90={np.percentile(res[mm], 90):.3f} n>1m={(res[mm] > 1).sum()}")
    worst = np.where(mm & (res > 1))[0][:8]
    for j in worst:
        ti = train_idx[j]
        log(f"  bad j={j}: qxy={xya[j]} txy={xyb[ti]} a={a[j].round(2)} "
            f"b={b[j].round(2)} res={res[j]:.2f}")

    # (b) our matches + reference bilinear sampling of OUR xyz
    sa, sb = [], []
    keep = []
    for j in np.where(m)[0]:
        p = bilinear(xyz_a, xya[j][0], xya[j][1])
        q = bilinear(xyz_b, xyb[train_idx[j]][0], xyb[train_idx[j]][1])
        if np.all(np.isfinite(p)) and np.all(np.isfinite(q)):
            sa.append(p); sb.append(q); keep.append(j)
    T = fit(np.float64(sa), np.float64(sb))
    log(f"(b) our matches + ref sampler: n={len(sa)} "
        f"|t|={np.linalg.norm(T[:3, 3]):.3f}")
    resb = np.linalg.norm(np.float64(sb) - (np.float64(sa) @ T_true[:3, :3].T
                                            + T_true[:3, 3]), axis=1)
    log(f"    gt-res med={np.median(resb):.3f} n>1m={(resb > 1).sum()}")

    # (c) cv2 matcher on our descriptors + our sampler
    matches = matcher.knnMatch(desc_a[va], desc_b[vb], k=2)
    good = [mt for mt, n2 in matches if mt.distance < 0.8 * n2.distance]
    ia = np.where(va)[0]
    ib = np.where(vb)[0]
    qs = np.array([ia[mt.queryIdx] for mt in good])
    ts = np.array([ib[mt.trainIdx] for mt in good])
    pa = np.asarray(bilinear_sample_3d(jnp.asarray(xyz_a),
                                       jnp.asarray(xya[qs, 0]),
                                       jnp.asarray(xya[qs, 1])), np.float64)
    pb = np.asarray(bilinear_sample_3d(jnp.asarray(xyz_b),
                                       jnp.asarray(xyb[ts, 0]),
                                       jnp.asarray(xyb[ts, 1])), np.float64)
    fin = np.isfinite(pa).all(1) & np.isfinite(pb).all(1)
    T = fit(pa[fin], pb[fin])
    log(f"(c) cv2 matches + our sampler: n={fin.sum()} "
        f"|t|={np.linalg.norm(T[:3, 3]):.3f}")
    resc = np.linalg.norm(pb[fin] - (pa[fin] @ T_true[:3, :3].T
                                     + T_true[:3, 3]), axis=1)
    log(f"    gt-res med={np.median(resc):.3f} n>1m={(resc > 1).sum()}")


if __name__ == "__main__" and "--probe2" in sys.argv:
    probe2()
