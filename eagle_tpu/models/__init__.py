"""Model zoo.  `CoordinateModel` is re-exported here to mirror the
reference's import path (`from eagle.models import CoordinateModel`)."""


def __getattr__(name):
    # lazy: importing the pipeline pulls in the full op stack
    if name == "CoordinateModel":
        from eagle_tpu.pipeline.coordinate_model import CoordinateModel

        return CoordinateModel
    raise AttributeError(name)
