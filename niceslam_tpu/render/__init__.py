from .renderer import RenderConfig, render_rays, render_image  # noqa: F401
