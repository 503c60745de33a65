from neddf_tpu.render.renderer import NeRFRender, RENDER_TARGETS  # noqa: F401
