from libjxl_tpu.container.boxes import (  # noqa: F401
    Box, ContainerContent, is_container, pack_container, parse_boxes,
    unpack_container,
)
