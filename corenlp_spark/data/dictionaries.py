"""Coref dictionaries — the analog of ``dcoref/Dictionaries.java`` (572 LoC
of list loading in the reference, from files under
``data/edu/stanford/nlp/dcoref/``): gender, animacy, and demonym tables used
by the sieve cascade's agreement gates and the demonym / role-appositive
precise constructs (``dcoref/Rules.java``).

Compact public-knowledge tables (common English first names, gendered role
nouns, country demonyms) — broadcast-sized driver constants, the same
deployment shape as the reference's dictionary files.
"""

from __future__ import annotations

MALE_NAMES = {
    "barack", "george", "john", "chris", "james", "robert", "michael",
    "david", "william", "richard", "thomas", "charles", "daniel", "paul",
    "mark", "donald", "steven", "andrew", "brian", "kevin", "jason",
    "frank", "henry", "jacob", "louis", "oscar", "simon", "victor", "tom",
    "walter", "felix", "hugo", "peter", "edward", "samuel", "jerry",
}
FEMALE_NAMES = {
    "marie", "jane", "mary", "sarah", "anna", "laura", "emma", "clara",
    "elena", "grace", "irene", "karen", "maria", "nora", "petra", "rosa",
    "tessa", "diane", "ivy", "alice", "julia", "susan", "linda", "nancy",
    "karen", "betty", "helen", "sandra", "donna", "carol", "ruth", "sara",
    "matilda", "beatrix", "cordelia",
}
MALE_NOUNS = {
    "man", "men", "boy", "father", "son", "brother", "husband", "uncle",
    "grandfather", "king", "prince", "actor", "waiter", "gentleman", "sir",
    "mr.", "widower", "nephew", "duke", "emperor",
}
FEMALE_NOUNS = {
    "woman", "women", "girl", "mother", "daughter", "sister", "wife",
    "aunt", "grandmother", "queen", "princess", "actress", "waitress",
    "lady", "madam", "mrs.", "ms.", "widow", "niece", "duchess", "empress",
}
# animate role/person nouns (Dictionaries.animateWords subset): these can
# antecede he/she/who and license role appositives ("president Obama")
ANIMATE_NOUNS = {
    "person", "people", "president", "senator", "minister", "mayor",
    "judge", "chairman", "director", "manager", "engineer", "teacher",
    "professor", "student", "doctor", "lawyer", "attorney", "organizer",
    "author", "writer", "singer", "artist", "painter", "leader", "founder",
    "officer", "official", "spokesman", "spokeswoman", "journalist",
    "reporter", "scientist", "researcher", "analyst", "economist", "ceo",
    "coach", "player", "driver", "farmer", "worker", "employee", "chief",
    "secretary", "governor", "ambassador", "general", "colonel", "captain",
    "nominee", "candidate", "champion", "graduate", "pianist", "chancellor",
    # profession/agent breadth (dcoref animate.unigrams carries thousands
    # of such nouns; r4 widening)
    "physicist", "chemist", "historian", "musician", "volunteer",
    "pioneer", "editor", "salesman", "statesman", "prosecutor", "defendant",
    "witness", "curator", "librarian", "architect", "surgeon", "nurse",
    "pilot", "soldier", "athlete", "actor", "actress", "poet", "novelist",
    "biographer", "diplomat", "investigator", "auditor", "regulator",
    "shareholder", "successor", "predecessor", "advocate", "spokesperson",
} | MALE_NOUNS | FEMALE_NOUNS
# inanimate pronouns/nouns never corefer with PERSON antecedents
INANIMATE_NOUNS = {
    "company", "corporation", "group", "startup", "university", "school",
    "bank", "institute", "city", "country", "report", "contract", "budget",
    "system", "project", "building", "bridge", "law", "policy", "election",
}
# country/region → demonym (Dictionaries.demonyms subset;
# dcoref/Rules.java entityIsDemonym): "France" ↔ "French"
DEMONYMS = {
    "france": "french", "germany": "german", "italy": "italian",
    "spain": "spanish", "portugal": "portuguese", "england": "english",
    "britain": "british", "ireland": "irish", "scotland": "scottish",
    "america": "american", "canada": "canadian", "mexico": "mexican",
    "brazil": "brazilian", "argentina": "argentine", "china": "chinese",
    "japan": "japanese", "india": "indian", "russia": "russian",
    "poland": "polish", "greece": "greek", "turkey": "turkish",
    "egypt": "egyptian", "kenya": "kenyan", "nigeria": "nigerian",
    "australia": "australian", "austria": "austrian", "norway": "norwegian",
    "sweden": "swedish", "denmark": "danish", "finland": "finnish",
    "netherlands": "dutch", "belgium": "belgian", "switzerland": "swiss",
    "hungary": "hungarian", "croatia": "croatian", "serbia": "serbian",
    "ukraine": "ukrainian", "israel": "israeli", "iran": "iranian",
    "iraq": "iraqi", "vietnam": "vietnamese", "korea": "korean",
}
_DEMONYM_TO_PLACE = {v: k for k, v in DEMONYMS.items()}


def gender_of(text: str, head_word: str | None = None) -> str:
    """MALE / FEMALE / UNKNOWN from the first-name and gendered-noun tables
    (Dictionaries.gender lookup order: name list, then head noun)."""
    first = text.split()[0].lower() if text else ""
    if first in MALE_NAMES:
        return "MALE"
    if first in FEMALE_NAMES:
        return "FEMALE"
    # leading gendered title/noun: "Mr. Smith", "Mrs. Jones"
    if first in MALE_NOUNS:
        return "MALE"
    if first in FEMALE_NOUNS:
        return "FEMALE"
    hw = (head_word or (text.split()[-1] if text else "")).lower()
    if hw in MALE_NOUNS:
        return "MALE"
    if hw in FEMALE_NOUNS:
        return "FEMALE"
    return "UNKNOWN"


def is_animate(ner: str, head_word: str) -> bool:
    if ner == "PERSON":
        return True
    if ner in ("ORGANIZATION", "LOCATION"):
        return False
    return head_word.lower() in ANIMATE_NOUNS


def demonym_match(a: str, b: str) -> bool:
    """True iff one text is the demonym of the other's place."""
    la, lb = a.lower(), b.lower()
    return DEMONYMS.get(la) == lb or DEMONYMS.get(lb) == la
