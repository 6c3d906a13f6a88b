from .boxes import (
    expand_boxes,
    remove_area_anomalies,
    remove_fully_contained,
    scale_boxes,
    to_axis_aligned,
)
from .decode import compact_decoded, decode_cells_jax, decode_quads_numpy
from .geometry import (
    clip_polygon,
    compute_intersection,
    normalize_polygon,
    point_in_polygon,
    polygon_area,
    polygon_intersection,
    polygon_iou,
    should_merge,
)
from .image import (
    batch_resize_and_pad,
    crop_axis_aligned,
    detector_preprocess_host,
    normalize_u8,
    read_image,
    resize_and_pad,
    resize_bilinear,
)
from .lanms import (
    locality_aware_nms,
    locality_aware_nms_native,
    locality_aware_nms_numpy,
    native_available,
    standard_nms,
)
from .reading_order import (
    reading_order_permutation,
    resolve_intersections,
    sort_boxes_reading_order,
    sort_boxes_reading_order_with_resolutions,
)
