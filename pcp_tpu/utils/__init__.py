from . import geometry, box_utils, common_utils
