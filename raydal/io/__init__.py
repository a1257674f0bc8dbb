from . import codecs, images, png  # noqa: F401
