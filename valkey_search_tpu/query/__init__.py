"""Query engine: parser → predicate tree → planner → execution → reply.

Reference layer L5 (src/query/, src/commands/filter_parser.cc, src/expr/).
"""
