from .recipe import run_recipe  # noqa: F401
