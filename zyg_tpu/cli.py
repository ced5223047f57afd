"""Command-line interface, flag-compatible with the reference CLI
(ref: src/cli/options.zig): -i/--input take, -o/--output, -f/--frame,
-n/--num-frames, --sample/--num-samples, -t/--threads (ignored: TPU),
--no-tex, --debug-mat, -s/--stats.

Usage: python -m zyg_tpu -i examples/takes/cornell.take
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="zyg_tpu", description="TPU-native zyg renderer")
    p.add_argument("-i", "--input", default="takes/cornell.take", help="take file")
    p.add_argument("-o", "--output", default="", help="output image path (PNG)")
    p.add_argument("-m", "--mount", action="append", default=[], help="mount directory")
    p.add_argument("-f", "--start-frame", type=int, default=0)
    p.add_argument("-n", "--num-frames", type=int, default=1)
    p.add_argument("--sample", type=int, default=0, help="first sample index")
    p.add_argument("--num-samples", type=int, default=0, help="sample count override")
    p.add_argument("-t", "--threads", type=int, default=0, help="ignored (TPU)")
    p.add_argument("--no-tex", action="store_true")
    p.add_argument("--debug-mat", action="store_true")
    p.add_argument("-s", "--stats", action="store_true")
    p.add_argument(
        "--checkpoint", default="",
        help="sensor-state file: resume from it when present, save to it "
        "after every chunk (progressive checkpoint/restart)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .io import fs
    from .io.take import load_take_file
    from .scene.loader import load_scene_file
    from .render.driver import Driver

    for m in args.mount:
        fs.push_mount(m)
    t0 = time.time()
    take = load_take_file(args.input)
    scene_path = take.scene_filename
    if not os.path.exists(scene_path):
        for m in args.mount:
            cand = os.path.join(m, take.scene_filename)
            if os.path.exists(cand):
                scene_path = cand
                break
    cam0 = take.cameras[0]
    t_a, t_b = cam0.frame_interval(args.start_frame)
    from .io import resource

    resource.set_frame(args.start_frame)
    scene = load_scene_file(scene_path, time0=t_a, time1=t_b)
    print(f"Loading time {time.time() - t0:.3f} s")

    if args.num_samples > 0:
        take.num_samples_per_pixel = args.num_samples

    out = args.output or (os.path.splitext(os.path.basename(args.input))[0] + ".png")
    render_time = 0.0
    driver = None
    for fi in range(args.num_frames):
        frame = args.start_frame + fi
        if fi > 0:
            # re-resolve animated transforms for this frame's shutter span
            # (ref cli/main.zig per-frame graph.simulate + scene.compile);
            # static resources hit the cache, '#'-sequences reload
            t_a, t_b = cam0.frame_interval(frame)
            resource.set_frame(frame)
            scene = load_scene_file(scene_path, time0=t_a, time1=t_b)
        driver = Driver(take=take, scene=scene)
        driver.progress.quiet = False
        t0 = time.time()
        if args.checkpoint and args.num_frames == 1:
            # progressive checkpoint/restart of one frame's accumulation
            driver.start_frame()
            if os.path.exists(args.checkpoint):
                driver.load_state(args.checkpoint)
                print(f"Resumed at sample {driver._iteration}")
            if take.photon.num_photons > 0:
                driver.bake_photons()
            if take.num_particles_per_pixel > 0 and driver._particles_traced == 0:
                driver.render_particles()
            spp_target = take.num_samples_per_pixel
            while driver._iteration < spp_target:
                step = min(driver.chunk_size, spp_target - driver._iteration)
                driver.render_iterations(step)
                driver.save_state(args.checkpoint)
        else:
            driver.render_frame()
        render_time += time.time() - t0
        print(f"Render time {time.time() - t0:.3f} s")

        t0 = time.time()
        fout = out
        if args.num_frames > 1:
            base, ext = os.path.splitext(out)
            fout = f"{base}_{frame:06d}{ext}" if "#" not in out else out
            from .io.fs import frame_dependant_name

            fout = frame_dependant_name(fout, frame) if "#" in fout else fout
        driver.export_frame(fout)
        # stereo: further layers as _l1, _l2 ... (ref exporting/sink.zig)
        for layer in range(1, driver.camera.num_layers):
            d2 = Driver(take=take, scene=scene, camera=driver.camera, layer=layer)
            d2.render_frame()
            base, ext = os.path.splitext(fout)
            d2.export_frame(f"{base}_l{layer}{ext}")
        print(f"Export time {time.time() - t0:.3f} s")
    w, h = driver.camera.resolution
    spp = take.num_samples_per_pixel

    if args.stats:
        print(f"resolution {w}x{h}, {spp} spp, {driver.rays_traced/1e6:.1f}M rays")
        print(f"{driver.rays_traced / render_time / 1e6:.1f} Mrays/s")
        for k, v in driver.memory_stats().items():
            print(f"  {k:12s} {v/1024/1024:8.2f} MiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
