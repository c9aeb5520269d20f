import jax, sys
sys.path.insert(0, "/root/repo")
from opencl_ray_tracer_tpu import RenderConfig
from opencl_ray_tracer_tpu.scene import random_scene
import bench
W, H = 1920, 1080
scene = random_scene(10, 1, seed=0, bounds=(float(W)-10, float(H)-10))
cfg = RenderConfig(width=W, height=H, shading="phong", shadows=True,
                   framebuffer_dtype="packed")
for i in range(3):
    us, rays = bench.bench_config(scene, cfg, tiled=True)
    print(f"headline rep {i}: {us:.0f} us -> {rays:.3e} rays/s", flush=True)
