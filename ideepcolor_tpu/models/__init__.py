from . import siggraph, caffe_net, global_stats  # noqa: F401
