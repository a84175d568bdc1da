"""Physical operators: index build, BM25 scorers (DataFrame slow path +
block-max WAND fast path), fusion, mutations."""
