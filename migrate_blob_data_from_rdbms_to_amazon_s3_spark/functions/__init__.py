from .scalars import (  # noqa: F401
    trim_description,
    s3_object_key,
    pages_for,
    clamp_limit,
    clamp_offset,
    safe_int,
    blob_to_base64,
    base64_to_blob,
    new_order_id,
    strip_s3_arn,
)
