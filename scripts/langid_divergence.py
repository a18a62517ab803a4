"""Measure the langid gap instead of assuming it (SURVEY #15).

The reference runs seeded ``langdetect.detect(text[:5000])``
(/root/reference/src/workflows/ingest/normalize.py:46-54) over ~55
languages; this engine ships a deterministic stopword-profile scorer
(kernel/langid.py) covering its table languages only. langdetect is not
in this container, so the measurement uses a LABELED fixture as ground
truth (the upper bound of what langdetect would report on clean
single-language text — its documented accuracy on such snippets is
>99%):

* agreement rate on IN-TABLE languages (the scorer's home turf);
* the disagreement taxonomy on OUT-OF-TABLE languages (what a real
  corpus in those languages would be mislabeled AS);
* the allow-list consequence (normalize.py:58-120 semantics, default
  allow = fr/en): how many documents the filter would WRONGLY KEEP
  (out-of-table text misattributed to an allowed language) or WRONGLY
  DROP (allowed-language text misattributed elsewhere) vs a perfect
  detector.

Output: the markdown table COVERAGE.md embeds + one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from ragstudio_spark.kernel import langid

# Labeled fixture: natural-register sample snippets, 4 per language.
# In-table languages first, then common European out-of-table ones.
FIXTURE: dict[str, list[str]] = {
    "en": [
        "The committee said that it would review the proposal with care "
        "and publish the findings for everyone to read.",
        "It is not clear that the results are final, but the team was "
        "confident this approach would work in practice.",
        "Most of the files were moved to the new server, and the rest "
        "are scheduled for the weekend migration window.",
        "This is the kind of weather that makes it hard to plan a trip "
        "to the coast with the whole family.",
    ],
    "fr": [
        "Le gouvernement a annoncé que les négociations avec les "
        "syndicats reprendraient dans une semaine pour trouver un accord.",
        "Nous avons visité la vieille ville avec des amis qui habitent "
        "dans le quartier depuis une dizaine d'années.",
        "Ce n'est pas une question simple, mais la réponse est dans les "
        "documents que vous avez reçus hier.",
        "Les enfants jouent dans le parc pendant que les parents "
        "discutent sur un banc à l'ombre des arbres.",
    ],
    "es": [
        "El gobierno anunció que las negociaciones con los sindicatos "
        "continuarán la próxima semana para buscar un acuerdo.",
        "Los niños juegan en el parque mientras sus padres conversan "
        "con los vecinos sobre las fiestas del barrio.",
        "No es una pregunta sencilla, pero la respuesta está en los "
        "documentos que usted recibió por la mañana.",
        "Una parte del equipo viajó a la capital para presentar el "
        "informe ante el comité y su presidente.",
    ],
    "de": [
        "Die Regierung hat angekündigt, dass die Verhandlungen mit den "
        "Gewerkschaften nächste Woche fortgesetzt werden.",
        "Die Kinder spielen im Park, während die Eltern auf einer Bank "
        "sitzen und sich mit den Nachbarn unterhalten.",
        "Das ist keine einfache Frage, aber die Antwort steht in den "
        "Unterlagen, die Sie gestern erhalten haben.",
        "Ein Teil des Teams ist in die Hauptstadt gereist, um den "
        "Bericht vor dem Ausschuss vorzustellen.",
    ],
    "it": [
        "Il governo ha annunciato che i negoziati con i sindacati "
        "riprenderanno la prossima settimana per trovare un accordo.",
        "I bambini giocano nel parco mentre i genitori parlano con i "
        "vicini del quartiere sotto gli alberi.",
        "Non è una domanda semplice, ma la risposta è nei documenti "
        "che avete ricevuto ieri mattina.",
        "Una parte della squadra è andata nella capitale per "
        "presentare il rapporto davanti al comitato.",
    ],
    "pt": [
        "O governo anunciou que as negociações com os sindicatos vão "
        "continuar na próxima semana para buscar um acordo.",
        "As crianças brincam no parque enquanto os pais conversam com "
        "os vizinhos do bairro à sombra das árvores.",
        "Não é uma pergunta simples, mas a resposta está nos "
        "documentos que você recebeu ontem de manhã.",
        "Uma parte da equipe viajou para a capital para apresentar o "
        "relatório ao comitê e ao seu presidente.",
    ],
    # ---- out-of-table: a real langdetect labels these correctly ----
    "nl": [
        "De regering heeft aangekondigd dat de onderhandelingen met de "
        "vakbonden volgende week worden voortgezet.",
        "De kinderen spelen in het park terwijl de ouders op een bankje "
        "zitten en met de buren praten.",
        "Het is geen eenvoudige vraag, maar het antwoord staat in de "
        "stukken die u gisteren heeft ontvangen.",
        "Een deel van het team is naar de hoofdstad gereisd om het "
        "rapport aan de commissie voor te leggen.",
    ],
    "sv": [
        "Regeringen har meddelat att förhandlingarna med facken "
        "kommer att återupptas nästa vecka.",
        "Barnen leker i parken medan föräldrarna sitter på en bänk "
        "och pratar med grannarna.",
        "Det är inte en enkel fråga, men svaret finns i de handlingar "
        "som ni fick i går.",
        "En del av laget har rest till huvudstaden för att lägga fram "
        "rapporten för utskottet.",
    ],
    "da": [
        "Regeringen har meddelt, at forhandlingerne med fagforeningerne "
        "genoptages i næste uge.",
        "Børnene leger i parken, mens forældrene sidder på en bænk og "
        "taler med naboerne.",
        "Det er ikke et enkelt spørgsmål, men svaret står i de papirer, "
        "som De modtog i går.",
        "En del af holdet er rejst til hovedstaden for at fremlægge "
        "rapporten for udvalget.",
    ],
    "ro": [
        "Guvernul a anunțat că negocierile cu sindicatele vor fi "
        "reluate săptămâna viitoare.",
        "Copiii se joacă în parc în timp ce părinții stau pe o bancă "
        "și vorbesc cu vecinii.",
        "Nu este o întrebare simplă, dar răspunsul se află în "
        "documentele pe care le-ați primit ieri.",
        "O parte din echipă a plecat în capitală pentru a prezenta "
        "raportul în fața comisiei.",
    ],
    "pl": [
        "Rząd ogłosił, że negocjacje ze związkami zawodowymi zostaną "
        "wznowione w przyszłym tygodniu.",
        "Dzieci bawią się w parku, podczas gdy rodzice siedzą na "
        "ławce i rozmawiają z sąsiadami.",
        "To nie jest proste pytanie, ale odpowiedź znajduje się w "
        "dokumentach, które otrzymali państwo wczoraj.",
        "Część zespołu pojechała do stolicy, aby przedstawić raport "
        "przed komisją.",
    ],
}

ALLOW = {"fr", "en"}  # the reference's default allow-list


def main() -> None:
    in_table = set(langid.STOPWORDS)
    rows = []
    for label, texts in FIXTURE.items():
        preds = [langid.detect_language(t) for t in texts]
        rows.append((label, preds))

    print("| true lang | in table? | predictions | correct | "
          "allow-list outcome vs perfect detector |")
    print("|---|---|---|---|---|")
    n_in = n_in_ok = 0
    wrong_keep = wrong_drop = 0
    taxonomy: dict[str, dict[str, int]] = {}
    for label, preds in rows:
        member = label in in_table
        correct = sum(p == label for p in preds)
        if member:
            n_in += len(preds)
            n_in_ok += correct
        for p in preds:
            if p != label:
                taxonomy.setdefault(label, {})
                taxonomy[label][str(p)] = taxonomy[label].get(str(p), 0) + 1
        # allow-list consequence per snippet
        outcomes = []
        for p in preds:
            keep_ours = p in ALLOW
            keep_true = label in ALLOW
            if keep_ours and not keep_true:
                wrong_keep += 1
                outcomes.append("WRONG-KEEP")
            elif not keep_ours and keep_true:
                wrong_drop += 1
                outcomes.append("WRONG-DROP")
            else:
                outcomes.append("ok")
        print(f"| {label} | {'yes' if member else 'NO'} "
              f"| {preds} | {correct}/{len(preds)} "
              f"| {outcomes} |")

    out_langs = [label for label, _ in rows if label not in in_table]
    print()
    print(f"in-table agreement: {n_in_ok}/{n_in} "
          f"({100.0 * n_in_ok / max(n_in, 1):.0f}%)")
    print(f"out-of-table languages tested: {out_langs}")
    print(f"misattribution taxonomy: {taxonomy}")
    print(f"allow-list(fr,en) divergence: wrong-keep={wrong_keep} "
          f"wrong-drop={wrong_drop} over "
          f"{sum(len(t) for t in FIXTURE.values())} snippets")
    print()
    print(json.dumps({
        "in_table_agreement": [n_in_ok, n_in],
        "taxonomy": taxonomy,
        "wrong_keep": wrong_keep,
        "wrong_drop": wrong_drop,
        "table_langs": sorted(in_table),
    }))


if __name__ == "__main__":
    main()
