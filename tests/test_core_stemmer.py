"""Porter2 stemmer vectors (public Snowball english sample vocabulary)
plus every surface form the classifier's stemmed stopword set depends on
(classify.go:20-71)."""

import pytest

from sift_spark.core.stemmer import stem

VECTORS = {
    # classifier stopword surface forms -> stemmed entries
    "authors": "author", "appendix": "appendix", "books": "book",
    "chapters": "chapter", "contents": "content", "edition": "edit",
    "ebook": "ebook", "footer": "footer", "glossary": "glossari",
    "gutenberg": "gutenberg", "navigation": "navig", "notes": "note",
    "pages": "page", "project": "project", "published": "publish",
    "publisher": "publish", "publishing": "publish", "texts": "text",
    "about": "about", "location": "locat", "profile": "profil",
    "shares": "share", "updated": "updat", "copyright": "copyright",
    "management": "manag", "permission": "permiss", "policies": "polici",
    "privacy": "privaci", "publications": "public", "purposes": "purpos",
    "reproduced": "reproduc", "reserved": "reserv", "rights": "right",
    "risk": "risk", "standards": "standard", "terms": "term", "used": "use",
    "citations": "citat", "department": "depart", "federal": "feder",
    "foundation": "foundat", "https": "https", "isbn": "isbn",
    "references": "refer",
    # snowball exceptional forms
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "proceed": "proceed", "exceed": "exceed",
    "succeed": "succeed", "inning": "inning", "outing": "outing",
    # classic porter2 behavior
    "consign": "consign", "consigned": "consign", "consigning": "consign",
    "consignment": "consign", "agreed": "agre", "agreement": "agreement",
    "feed": "feed", "cries": "cri", "ties": "tie", "gaps": "gap",
    "gas": "gas", "this": "this", "hopeful": "hope", "hopefulness": "hope",
    "national": "nation", "rational": "ration", "conditional": "condit",
    "conditionally": "condit", "caresses": "caress", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "relational": "relat", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefully": "hope", "callousness": "callous",
    "formality": "formal", "sensibility": "sensibl", "sensitivity": "sensit",
    "triplicate": "triplic", "formative": "format", "formalize": "formal",
    "electricity": "electr", "electrical": "electr", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "activate": "activ", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas", "roll": "roll",
    "skating": "skate", "dies": "die", "lies": "lie", "generate": "generat",
    "generous": "generous", "communism": "communism", "arsenal": "arsenal",
}


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()))
def test_porter2_vectors(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    assert stem("a") == "a"
    assert stem("at") == "at"
    assert stem("BE") == "be"  # lowercased


def test_case_insensitive():
    assert stem("Navigation") == "navig"
    assert stem("COPYRIGHT") == "copyright"
