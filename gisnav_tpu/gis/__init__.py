"""Host-side GIS retrieval: WMS client, orthoimage cache, map sizing."""
from gisnav_tpu.gis.cache import OrthoImage, OrthoImageCache  # noqa: F401
from gisnav_tpu.gis.wms import (  # noqa: F401
    WMSClient,
    orthoimage_size_for_camera,
    request_orthoimage,
)
