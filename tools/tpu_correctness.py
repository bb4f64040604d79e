#!/usr/bin/env python
"""TPU-side pixel-correctness harness (the north star's "pixel-exact vs
CPU reference" clause, BASELINE.md).

All automated tests pin the CPU backend, so nothing there proves that
*TPU-compiled* kernels produce the right pixels. This harness closes that:

  mode --render BACKEND OUT.npz : render the probe set (trace fields +
      shaded frame) on that backend in a fresh process and write one .npz
      at exit (a single end-of-process D2H, so the runtime's D2H poison
      cannot contaminate the timing-sensitive processes; see
      docs/TPU_NOTES.md).
  default mode: run --render for the TPU and the CPU oracle as
      subprocesses, compare, and print one JSON verdict line (also written
      to TPU_CORRECTNESS.json when invoked from the repo root).

Probe set: the standard demo world, three cameras (terrain, grazing,
underwater) at 256x128, traced with trace_wavefront3 and shaded with
render_frame3, PLUS the headline v4 self-serving kernel (render_frame4,
fused shade) and the 1-bounce path tracer on its v4 route (path_trace3
v4=True). Pass criteria: hit masks ≤0.2% apart (fp32 order of ops
differs between Mosaic and the CPU path at grazing boundaries), voxel ids
exact where both hit, shaded RGBA8 within 2/255 on ≥99.8% of pixels;
path-traced radiance within 2/255 on ≥99% of pixels. The PT bound is
looser than the primary-ray bound because a bounce AMPLIFIES fp32
order-of-ops divergence chaotically: a 1-ulp difference in the primary
hit t can move the scatter origin across a voxel boundary, and the
whole secondary path differs. The scatter-ORIGIN instance — the hit
point lying exactly ON an integer voxel face in the crossing axis,
where floor() is knife-edge — is killed deterministically by snapping
that coordinate to its integer face before the bounce rebase
(wavefront3._path_frame / pathtrace4, round-5; measured cam0
0.9901 -> 0.9915). The remaining divergence class is the secondary
march itself: Mosaic-vs-XLA-CPU fp order picks a different ENTRY FACE
or voxel at grazing corners, which no origin quantization can fix —
that irreducible class is why the bound is 0.99, not 0.998.
"""

import json
import os
import subprocess
import sys

# when invoked by script path, sys.path[0] is tools/ — make the package
# importable regardless of how the subprocess was launched
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAMS = [
    ((35.0, 45.0, 0.0), (128.0, 192.0, 128.0)),
    ((5.0, 100.0, 0.0), (40.0, 80.0, 200.0)),
    ((-20.0, 300.0, 0.0), (128.0, 40.0, 128.0)),  # underwater looking up
]
W, H = 256, 128
ROUNDS = 24
WC = 8


def render_probe(out_path):
    import jax
    import jax.numpy as jnp

    from voxelraytracing_tpu.models.raytracer import RenderSettings  # noqa
    from voxelraytracing_tpu.ops import noise
    from voxelraytracing_tpu.ops.camera import CamData, generate_rays
    from voxelraytracing_tpu.ops.wavefront3 import (
        build_render_grid3_host,
        render_frame3,
        trace_wavefront3,
    )
    from voxelraytracing_tpu.world.demo import (
        demo_chunk_grids_host,
        demo_materials,
    )

    from voxelraytracing_tpu.ops.wavefront3 import path_trace3
    from voxelraytracing_tpu.ops.wavefront4 import render_frame4

    perm = noise.make_permutation(7)
    grids, cells = demo_chunk_grids_host(
        perm, np.zeros(3, np.int64), WC, WC * 32 * 0.45, int(WC * 32 * 0.28)
    )
    mats = demo_materials()
    rg3 = build_render_grid3_host(
        grids, cells, np.zeros(3, np.int32), WC, mats
    )
    outs = {}
    results = []
    for ci, (rot, eye) in enumerate(CAMS):
        cam = CamData.create(rot, eye, 70.0, (W, H))
        origin, _ = generate_rays(cam, np.zeros(3, np.int32))
        wf = trace_wavefront3(rg3, origin, cam=cam, rounds=ROUNDS)
        img = render_frame3(
            rg3, cam, mats.color, sun_pos=(1000.0, 2500.0, 500.0),
            shadows=True, rounds=ROUNDS,
        )
        # the headline tracer: v4 self-serving kernel, fused in-kernel
        # shade (ONE launch — the exact program bench.py times)
        img4 = render_frame4(
            rg3, cam, mats.color, sun_pos=(1000.0, 2500.0, 500.0),
            rounds=2 * ROUNDS, fused=True,
        )
        # 1-bounce path trace on the v4 route with the config-3 ship
        # knobs (capped bounce + compact straggler resume — the resume
        # runs stragglers to full convergence, which CLOSED the round-3
        # cam0 unconverged-exit gap)
        pt = path_trace3(
            rg3, cam, mats, sun_pos=(1000.0, 2500.0, 500.0),
            bounces=1, samples=1, key=jax.random.PRNGKey(0),
            rounds=2 * ROUNDS, v4=True,
            bounce_steps_per_round=16, bounce_rounds=2,
            compact_tiles=512,
        )
        results.append((ci, wf, img, img4, pt))
    # orbit sweep over the fused route: warm tokens chained frame to
    # frame exactly as bench.py's moving-camera metric drives it
    orbit = []
    tok = None
    for oi in range(6):
        ang = np.deg2rad(60.0 * oi)
        eye = (128.0 + 90.0 * np.cos(ang), 185.0,
               128.0 + 90.0 * np.sin(ang))
        cam = CamData.create(
            (30.0, (np.degrees(ang) + 180.0) % 360.0, 0.0), eye, 70.0,
            (W, H),
        )
        # rounds is only a safety bound (converged blocks exit early);
        # 4x headroom keeps BOTH platforms fully converged — at 2x, one
        # orbit view left platform-divergent unconverged residue (fp32
        # op-order differences perturb the serve schedule near the cap)
        io, tok = render_frame4(
            rg3, cam, mats.color, sun_pos=(1000.0, 2500.0, 500.0),
            rounds=4 * ROUNDS, fused=True, cache=tok, return_cache=True,
        )
        orbit.append(io)
    # ONE D2H at the very end of the process
    for ci, wf, img, img4, pt in results:
        outs[f"hit{ci}"] = np.asarray(wf.hit)
        outs[f"vox{ci}"] = np.asarray(wf.voxel)
        outs[f"t{ci}"] = np.asarray(wf.t)
        outs[f"img{ci}"] = np.asarray(img)
        outs[f"img4_{ci}"] = np.asarray(img4)
        outs[f"pt{ci}"] = np.asarray(pt)
    for oi, io in enumerate(orbit):
        outs[f"orb{oi}"] = np.asarray(io)
    outs["backend"] = np.asarray(jax.default_backend())
    np.savez(out_path, **outs)


def compare(tpu_path, cpu_path):
    a = np.load(tpu_path)
    b = np.load(cpu_path)
    report = {"backend_device": str(a["backend"]), "cams": []}
    ok = True
    for ci in range(len(CAMS)):
        ha, hb = a[f"hit{ci}"], b[f"hit{ci}"]
        hit_mm = float((ha != hb).mean())
        both = ha & hb
        vox_mm = int(
            (a[f"vox{ci}"][both] != b[f"vox{ci}"][both]).sum()
        )
        t_med = float(np.median(np.abs(a[f"t{ci}"] - b[f"t{ci}"])))
        ia = a[f"img{ci}"].view(np.uint32).reshape(H, W)
        ib = b[f"img{ci}"].view(np.uint32).reshape(H, W)
        da = np.stack(
            [((ia >> s) & 0xFF).astype(np.int32) for s in (0, 8, 16)], -1
        )
        db = np.stack(
            [((ib >> s) & 0xFF).astype(np.int32) for s in (0, 8, 16)], -1
        )
        d = np.abs(da - db).max(axis=-1)
        img_frac_ok = float((d <= 2).mean())
        i4a = a[f"img4_{ci}"].view(np.uint32).reshape(H, W)
        i4b = b[f"img4_{ci}"].view(np.uint32).reshape(H, W)
        d4a = np.stack(
            [((i4a >> s) & 0xFF).astype(np.int32) for s in (0, 8, 16)], -1
        )
        d4b = np.stack(
            [((i4b >> s) & 0xFF).astype(np.int32) for s in (0, 8, 16)], -1
        )
        d4 = np.abs(d4a - d4b).max(axis=-1)
        img4_frac_ok = float((d4 <= 2).mean())
        dpt = np.abs(
            a[f"pt{ci}"].astype(np.float64) - b[f"pt{ci}"].astype(np.float64)
        ).max(axis=-1)
        pt_frac_ok = float((dpt <= 2.0 / 255.0).mean())
        cam_ok = (
            hit_mm <= 0.002 and vox_mm == 0 and img_frac_ok >= 0.998
            and img4_frac_ok >= 0.998 and pt_frac_ok >= 0.99
        )
        ok &= cam_ok
        report["cams"].append(
            {
                "cam": ci,
                "hit_mismatch_frac": round(hit_mm, 6),
                "voxel_mismatches": vox_mm,
                "t_median_absdiff": round(t_med, 6),
                "img_frac_within_2": round(img_frac_ok, 6),
                "img4_frac_within_2": round(img4_frac_ok, 6),
                "pt_frac_within_2_255": round(pt_frac_ok, 6),
                "ok": cam_ok,
            }
        )
    # warm-chained orbit frames through the fused route
    orb = []
    for oi in range(6):
        key = f"orb{oi}"
        if key not in a or key not in b:
            break
        oa = a[key].view(np.uint32).reshape(H, W)
        ob = b[key].view(np.uint32).reshape(H, W)
        dda = np.stack(
            [((oa >> s) & 0xFF).astype(np.int32) for s in (0, 8, 16)], -1
        )
        ddb = np.stack(
            [((ob >> s) & 0xFF).astype(np.int32) for s in (0, 8, 16)], -1
        )
        frac = float((np.abs(dda - ddb).max(axis=-1) <= 2).mean())
        orb.append(round(frac, 6))
        ok &= frac >= 0.998
    report["orbit_frac_within_2"] = orb
    report["ok"] = bool(ok)
    return report


def main():
    if len(sys.argv) >= 4 and sys.argv[1] == "--render":
        backend, out = sys.argv[2], sys.argv[3]
        if backend == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        render_probe(out)
        return 0

    tmp = "/tmp/tpu_correctness"
    os.makedirs(tmp, exist_ok=True)
    tpu_npz = os.path.join(tmp, "tpu.npz")
    cpu_npz = os.path.join(tmp, "cpu.npz")
    env = dict(os.environ)
    for backend, out in (("default", tpu_npz), ("cpu", cpu_npz)):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--render", backend,
             out],
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode != 0:
            print(json.dumps({"ok": False, "error": f"render {backend} rc={r.returncode}"}))
            return 1
    report = compare(tpu_npz, cpu_npz)
    line = json.dumps(report)
    print(line)
    # default verdict file + optional per-round copy (--out FILE), so each
    # round's on-chip verdict is preserved (e.g. TPU_CORRECTNESS_r03.json)
    outs = ["TPU_CORRECTNESS.json"]
    if len(sys.argv) >= 3 and sys.argv[1] == "--out":
        outs.append(sys.argv[2])
    for path in outs:
        try:
            with open(path, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
