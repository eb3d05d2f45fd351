from opensearch_spark.search.queries import (  # noqa: F401
    Bool,
    Boosting,
    ConstantScore,
    DisMax,
    Exists,
    FunctionScore,
    Fuzzy,
    Ids,
    Match,
    MatchAll,
    MatchBoolPrefix,
    MatchNone,
    MatchPhrase,
    MatchPhrasePrefix,
    Intervals,
    MoreLikeThis,
    MultiMatch,
    Phonetic,
    ScoreFunction,
    SpanContaining,
    SpanFieldMasking,
    SpanFirst,
    SpanMulti,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanWithin,
    DistanceFeature,
    Prefix,
    Query,
    RankFeature,
    Range,
    Regexp,
    Term,
    Terms,
    TermsSet,
    Wildcard,
    from_dsl,
)
from opensearch_spark.search.executor import Searcher  # noqa: F401
from opensearch_spark.search.query_string import parse_query_string  # noqa: F401
from opensearch_spark.search.scroll import Scroll, scroll  # noqa: F401
from opensearch_spark.search.suggest import (  # noqa: F401
    completion_suggest,
    phrase_suggest,
    term_suggest,
)
from opensearch_spark.search.highlight import (  # noqa: F401
    fvh_highlight,
    highlight_field,
    highlight_fragments,
)
from opensearch_spark.search.rankeval import rank_metrics, with_ranks  # noqa: F401
