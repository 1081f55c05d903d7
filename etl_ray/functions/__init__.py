from etl_ray.functions import expr  # noqa: F401
