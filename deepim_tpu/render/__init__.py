from deepim_tpu.render.mesh import (  # noqa: F401
    Mesh,
    MeshBank,
    load_textured_mesh,
    make_colored_mesh,
    make_icosphere,
    make_test_cube,
    parse_obj,
)
from deepim_tpu.render.rasterizer import (  # noqa: F401
    RasterConfig,
    project_vertices,
    rasterize,
    rasterize_single,
    render_mask,
)
