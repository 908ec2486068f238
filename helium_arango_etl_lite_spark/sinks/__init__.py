from .arango import arango_bulk_import, render_import_batches

__all__ = ["arango_bulk_import", "render_import_batches"]
